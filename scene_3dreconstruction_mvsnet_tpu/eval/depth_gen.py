"""Eval stage A: per-reference-view depth map generation.

TPU equivalent of save_depth (/root/reference/eval.py:283-500): run MVSNet
for each reference view of the eval dataset and write the output tree

    <outdir>/<acquisition>/<scan>/images/XXXXXXXX.png
                                 /depth_est/XXXXXXXX.pfm (+ .png preview)
                                 /confidence/XXXXXXXX.pfm (+ .png preview)
                                 /cams/XXXXXXXX_cam.txt

The forward pass is one jitted launch per shape; the writer runs on host
threads so the device never waits on PNG/PFM encoding.
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor

import jax.numpy as jnp
import numpy as np

from ..data import Loader, find_dataset_def
from ..io.cams import write_cam
from ..io.images import save_image_u8
from ..io.pfm import save_pfm
from ..train.state import make_infer_step


def _normalize01(x: np.ndarray) -> np.ndarray:
    lo, hi = np.min(x), np.max(x)
    return (x - lo) / (hi - lo) if hi > lo else np.zeros_like(x)


def _write_view(outdir_acq, filename_tpl, ref_img, depth, confidence, K, E):
    img_path = os.path.join(outdir_acq, filename_tpl.format("images", ".png"))
    depth_path = os.path.join(outdir_acq, filename_tpl.format("depth_est", ".pfm"))
    conf_path = os.path.join(outdir_acq, filename_tpl.format("confidence", ".pfm"))
    cam_path = os.path.join(outdir_acq, filename_tpl.format("cams", "_cam.txt"))
    for p in (img_path, depth_path, conf_path, cam_path):
        os.makedirs(os.path.dirname(p), exist_ok=True)

    save_image_u8(img_path, ref_img)
    save_pfm(depth_path, depth.astype(np.float32))
    save_image_u8(depth_path.replace(".pfm", ".png"), _normalize01(depth))
    save_pfm(conf_path, confidence.astype(np.float32))
    save_image_u8(conf_path.replace(".pfm", ".png"), np.clip(confidence, 0, 1))
    write_cam(cam_path, K=K, R=E, depth_params=["000", "2.5", "", ""])


def _dump_depth_gen_debug(debug_dir, batch_idx, bits, ref_img, depth, confidence):
    """Headless equivalents of the reference's --debug_depth_gen bits 0/1
    (/root/reference/eval.py:333, :413-427): PNG dumps instead of
    cv2.imshow windows."""
    os.makedirs(debug_dir, exist_ok=True)
    if "0" in bits:
        ref_img = np.asarray(ref_img)
        save_image_u8(
            os.path.join(debug_dir, f"input_view{batch_idx:0>4}.png"),
            ref_img if ref_img.dtype == np.uint8 else np.clip(ref_img, 0, 1),
        )
    if "1" in bits:
        save_image_u8(
            os.path.join(debug_dir, f"depth_est_view{batch_idx:0>4}.png"),
            _normalize01(depth),
        )
        save_image_u8(
            os.path.join(debug_dir, f"confidence_view{batch_idx:0>4}.png"),
            np.clip(confidence, 0, 1),
        )
        save_image_u8(
            os.path.join(debug_dir, f"confidence_gt50_view{batch_idx:0>4}.png"),
            np.clip(confidence * (confidence > 0.5), 0, 1),
        )


def auto_depth_chunk(
    img_res: tuple[int, int], numdepth: int,
    budget_elems: int = 100_000_000,
    batch_size: int = 1,
) -> int | None:
    """Depth-chunk size bounding the XLA sweep's warp-footprint buffers.

    The XLA sweep — and the fused Pallas kernel's in-graph lax.cond
    fallback branch, whose peak allocation XLA charges even when the
    Pallas branch executes — materializes per-chunk warp footprints of
    B*Dc*h4*w4*32 elements. Full-D at DTU-full res (864x1152, D192) is
    ~34 GB, past 16 GB HBM. Bound each buffer to ``budget_elems``
    (~190 MB bf16 at the default); chunking is exact (variance is
    independent per depth plane). Returns None when no chunking is
    needed (small shapes sweep all planes at once).
    """
    h4 = (img_res[0] // 32) * 8  # dataset crops to x32; features are /4
    w4 = (img_res[1] // 32) * 8
    dc = max(1, budget_elems // (batch_size * h4 * w4 * 32))
    if dc >= numdepth:
        return None
    return next(c for c in range(dc, 0, -1) if numdepth % c == 0)


def _pack_u8(batch: dict, cache: dict | None = None) -> dict:
    """Transfer packing for stage A (applied inside the BackgroundLoader
    producer thread, overlapped with device compute): loaders emit images
    that are exactly u8/255 (PIL resizes in the u8 domain), so shipping a
    u8 copy cuts host->device bytes 4x — measured 3.0 -> 0.96 s per 5-view
    864x1152 batch through the remote-TPU tunnel. ``make_infer_step``
    normalizes on device; the exactness check keeps genuinely float-valued
    custom datasets on the f32 path (lossless by construction).

    ``cache`` (when the batch carries view identity) memoizes the rint +
    exactness check per (scan, view): each image recurs in ~NviewGen
    batches per scan, and on this 1-core host the per-batch rint was the
    producer thread's dominant steady cost. An inexact image caches as
    None and keeps every batch containing it on the f32 path."""

    def pack_one(img: np.ndarray) -> np.ndarray | None:
        u8 = np.rint(img * 255.0).astype(np.uint8)
        return u8 if np.array_equal(u8.astype(np.float32) / 255.0, img) else None

    imgs = batch["imgs"]
    if imgs.dtype == np.uint8:
        # u8-native loader (dataloader_eval emit_u8): nothing to pack
        batch["imgs_dev"] = imgs
        return batch
    if cache is None or "view_ids" not in batch or "scan" not in batch:
        u8 = pack_one(imgs)
        if u8 is not None:
            batch["imgs_dev"] = u8
        return batch

    views = []
    for b in range(imgs.shape[0]):
        row = []
        for v in range(batch["view_ids"].shape[1]):
            key = (batch["scan"][b], int(batch["view_ids"][b, v]))
            if key not in cache:
                cache[key] = pack_one(imgs[b, v])
                while len(cache) > 320:  # ~1 GB at DTU-full res
                    cache.pop(next(iter(cache)))
            if cache[key] is None:
                return batch  # inexact image: whole batch stays f32
            row.append(cache[key])
        views.append(np.stack(row))
    batch["imgs_dev"] = np.stack(views)
    return batch


class _DeviceImageStore:
    """Per-(scan, view) device-resident u8 image cache for eval stage A.

    Each image of a scan is consumed ~NviewGen times (once as the reference
    view, repeatedly as a source view of its neighbours), and the dominant
    steady-state cost of stage A on this host is the host->device image
    copy (14.9 MB/view at DTU-full through the ~20 MB/s TPU tunnel). The
    store uploads each unique image ONCE via ``jax.device_put`` and hands
    back device references; ``make_infer_step_views`` stacks them on device.
    LRU-evicted beyond ``budget_bytes`` (finished scans age out naturally).
    """

    def __init__(self, budget_bytes: int = 768 << 20) -> None:
        import collections

        self._entries: "collections.OrderedDict[tuple, object]" = (
            collections.OrderedDict()
        )
        self._nbytes = 0
        self.budget_bytes = budget_bytes
        self.uploads = 0

    def get(self, key: tuple, host_u8: np.ndarray):
        import jax

        entry = self._entries.get(key)
        if entry is not None:
            self._entries.move_to_end(key)
            return entry
        dev = jax.device_put(np.ascontiguousarray(host_u8))
        self._entries[key] = dev
        self._nbytes += host_u8.nbytes
        self.uploads += 1
        while self._nbytes > self.budget_bytes and len(self._entries) > 1:
            _, old = self._entries.popitem(last=False)
            self._nbytes -= old.nbytes
        return dev

    def gather(self, sample: dict, n_real: int):
        """Device arrays for every (sample, view) slot of a batch, or None
        when the batch lacks the u8 pack / view identity to key the store."""
        if "imgs_dev" not in sample or "view_ids" not in sample:
            return None
        out = []
        for b in range(n_real):
            scan = sample["scan"][b]
            for v in range(sample["view_ids"].shape[1]):
                key = (scan, int(sample["view_ids"][b, v]))
                out.append(self.get(key, sample["imgs_dev"][b, v]))
        return out


def save_depth(
    model,
    variables,
    *,
    dataset: str,
    dataset_name: str,
    testpath: str,
    testlist: str,
    outdir: str,
    NviewGen: int = 5,
    numdepth: int = 192,
    interval_scale: float = 1.06,
    pairfile: str = "pair.txt",
    cam_subfolder: str = "Cameras",
    img_subfolder: str = "Rectified/{}/{:0>8}.png",
    img_res: tuple[int, int] = (512, 640),
    num_workers: int = 4,
    debug_bitmask: int = 0,
    debug_depth_gen: int = 0,
    batch_size: int = 1,
    img_cache: str | None = None,
    pallas_sweep: bool = False,
    env_samples: int = 8,
    device_img_store: bool = True,
    on_scan_done=None,
    aot_cache: str | None = None,
    data_shards: int = 1,
    session: dict | None = None,
) -> dict:
    """Run depth generation for every reference view. Returns timing stats.

    ``session`` (serving mode, eval.py --serve): a dict owned by the caller
    and passed to every save_depth call of a long-lived process. Warm state
    is hoisted into it and reused across scans — the jitted/AOT-gated infer
    step (keyed by model config + batch geometry, so a config change still
    recompiles), the per-(scan, view) device image store, the u8 pack cache,
    the planned sweep envelope, and the one-time D2H channel warmup. This is
    the production serving shape the round-4 data demands: per-process costs
    (D2H channel setup 30-300 s, ~20 s XLA compile) amortize across the scan
    stream instead of recurring per scan.

    ``debug_depth_gen`` mirrors the reference's bitmask
    (/root/reference/eval.py:61-67) with headless dumps under
    ``<outdir>/<acq>/debug_depth_gen/``: bit 0 input ref image, bit 1 depth
    prediction + confidence (+ conf>50%) PNGs, bit 2 per-view point-cloud
    PLY, bit 3 combined all-views point-cloud PLY (+ a cropped/outlier-
    removed/voxel-downsampled variant, /root/reference/eval.py:472-497).

    ``batch_size`` > 1 pipelines depth generation: the final partial batch
    is padded by repeating the last view (padded outputs are not written).
    ``pallas_sweep`` plans a fused-kernel window envelope over
    ``env_samples`` eval samples and dispatches the Pallas sweep with an
    in-graph XLA fallback (requires the model's bf16 fast path).
    """
    print(f"============ Generating DEPTH MAPS using {NviewGen} views")
    # First device->host transfer warmup, ASYNC from function entry: the
    # axon tunnel sets up its D2H channel lazily at the process's first
    # host materialization, at a highly variable cost (measured 31-130+ s
    # in ~32 s epochs, independent of array size). Start it on a thread NOW
    # so dataset init / envelope planning / the AOT-cache load overlap it;
    # the pipeline joins before its first dispatch and only the EXPOSED
    # remainder shows up in the d2h_warmup phase.
    import threading as _threading

    warm_stats = {}

    def _d2h_warm():
        t0 = time.time()
        np.asarray(jnp.zeros((8,)) + 1)
        warm_stats["total_s"] = time.time() - t0

    warm_thread = None
    if session is None or not session.get("d2h_warmed"):
        warm_thread = _threading.Thread(target=_d2h_warm, daemon=True)
        warm_thread.start()
        if session is not None:
            session["d2h_warmed"] = True

    # wall-clock phase accounting (printed at the end): where stage A time
    # actually goes on this host — setup vs the overlapped dispatch loop
    phases: dict[str, float] = {}
    t_phase = time.time()

    def _mark(name: str) -> None:
        nonlocal t_phase
        now = time.time()
        phases[name] = phases.get(name, 0.0) + (now - t_phase)
        t_phase = now

    MVSDataset = find_dataset_def(dataset)
    test_dataset = MVSDataset(
        datapath=testpath,
        listfile=testlist,
        mode="test",
        nviews=NviewGen,
        ndepths=numdepth,
        interval_scale=interval_scale,
        pairfile=pairfile,
        cam_subfolder=cam_subfolder,
        img_subfolder=img_subfolder,
        img_res=img_res,
        dataset_name=dataset_name,
        img_cache=img_cache,
        # u8-native images end to end (dataloader_eval honors this; legacy
        # eval datasets ignore it and stay on the f32 + pack path)
        emit_u8=True,
    )
    _mark("dataset_init")
    if pallas_sweep:
        # plan the fused-kernel window envelope over a spread of eval
        # samples; the eval dispatch keeps an in-graph XLA fallback, so an
        # under-planned envelope costs speed, never correctness
        import jax.numpy as _jnp

        if model.dtype != _jnp.bfloat16:
            raise ValueError("pallas_sweep requires the bf16 fast path "
                             "(model dtype bfloat16)")
        from ..ops.pallas.sweep_variance import (
            merge_envelopes,
            suggest_envelope,
        )

        # envelope result cache (under the AOT cache dir): the rig geometry
        # of an acquisition is fixed, so later serving processes skip the
        # sample reads + span probes (~3-4 s/process). Risk-free by
        # construction — a stale envelope only costs speed (the eval
        # dispatch falls back to the XLA sweep in-graph), never correctness.
        env_cache_path = None
        sweep_env = None
        if session is not None and "sweep_env" in session:
            # serving: the acquisition's rig geometry is fixed, so the first
            # request's envelope serves the stream (a later out-of-envelope
            # scan costs speed only — the dispatch falls back in-graph) and,
            # critically, keeps repr(model) stable so the warm jitted infer
            # is reused instead of recompiled per scan
            sweep_env = session["sweep_env"]
        elif aot_cache:
            import hashlib
            import json as _json

            try:
                st = os.stat(testlist)
                raw = repr((
                    os.path.abspath(testpath), st.st_mtime_ns, st.st_size,
                    pairfile, cam_subfolder, tuple(img_res), numdepth,
                    float(interval_scale), env_samples, NviewGen,
                ))
                os.makedirs(aot_cache, exist_ok=True)
                env_cache_path = os.path.join(
                    aot_cache,
                    "env_" + hashlib.sha256(raw.encode()).hexdigest()[:24]
                    + ".json",
                )
                if os.path.exists(env_cache_path):
                    with open(env_cache_path) as f:
                        y, pr_c, pcp_c = _json.load(f)
                    sweep_env = (tuple(int(v) for v in y), int(pr_c), int(pcp_c))
                    print(f"pallas_sweep envelope (cached): {sweep_env}")
            except OSError:
                env_cache_path = None

        if sweep_env is None:
            n = min(env_samples, len(test_dataset))
            idxs = np.unique(
                np.linspace(0, len(test_dataset) - 1, n).astype(int)
            )
            env = {}
            h4 = w4 = None
            for i in idxs:
                s = test_dataset[int(i)]
                h4, w4 = s["imgs"].shape[1] // 4, s["imgs"].shape[2] // 4
                e = suggest_envelope(
                    s["proj_matrices"][1:], s["proj_matrices"][0],
                    s["depth_values"], h4, w4,
                )
                env = merge_envelopes(env, e)
            # Per-view tap spans: each row is a FULL gather+fma pass in the
            # kernel — the dominant device cost (~60% of the forward), so a
            # blanket +1 yspan margin costs ~[1/yspan] more sweep work on
            # EVERY batch. Ship the sampled spans exactly: an unsampled
            # view that needs one more row trips the in-graph XLA fallback
            # for its batch (speed, never correctness), which the sampling
            # spread makes rare. Margin stays on pr (patch rows are DMA
            # size, not compute: +8 rows is ~25% more patch traffic at
            # ~0.1 ms/scan) to keep the `covers` validity check robust.
            sweep_env = (
                env["yspan"],
                -(-(env["pr"] + 8) // 8) * 8, env["pcp"],
            )
            print(
                f"pallas_sweep envelope ({len(idxs)} samples + margin): "
                f"{sweep_env}"
            )
            if env_cache_path:
                tmp = f"{env_cache_path}.tmp.{os.getpid()}"
                with open(tmp, "w") as f:
                    _json.dump(
                        [list(sweep_env[0]), sweep_env[1], sweep_env[2]], f
                    )
                os.replace(tmp, env_cache_path)
        if session is not None:
            session["sweep_env"] = sweep_env
        model = model.clone(pallas_sweep_env=sweep_env)
    _mark("envelope_plan")
    if model.depth_chunk is None:
        dc = auto_depth_chunk(img_res, numdepth, batch_size=batch_size)
        if dc is not None:
            print(f"auto depth_chunk: {dc} (bounds the XLA sweep/fallback "
                  f"footprint at image res {img_res}, D={numdepth}, "
                  f"B={batch_size})")
            model = model.clone(depth_chunk=dc)
    loader = Loader(test_dataset, batch_size=batch_size, num_workers=num_workers)
    # ``aot_cache`` wraps each jitted step in an on-disk compiled-executable
    # cache: later processes with the same model config + batch geometry
    # skip the ~20 s XLA compile entirely (utils/aot_cache.py; JAX's
    # persistent compile cache does not engage under the axon plugin)
    from ..utils.aot_cache import AotGate

    shard_fn = None
    infer_key = ("infer", repr(model), data_shards, batch_size)
    if session is not None and session.get("infer_key") == infer_key:
        # warm serving: same model config + batch geometry as the previous
        # request — reuse the jitted infer (and sharded variables) outright
        infer = session["infer"]
        shard_fn = session.get("shard_fn")
        if shard_fn is not None:
            variables = session["sharded_variables"]
            device_img_store = False
    elif data_shards > 1:
        # multi-device stage A: the view/batch axis sharded over 'data'
        # (parallel/sharding.py::make_sharded_infer). The per-(scan,view)
        # device image store is single-device by construction — skip it and
        # let shard_fn place the batch (the u8-native loader keeps the
        # transfer at u8 either way).
        import jax as _jax

        from ..parallel import make_mesh, make_sharded_infer

        if batch_size % data_shards:
            raise ValueError(
                f"batch_size {batch_size} must be a multiple of "
                f"data_shards {data_shards}"
            )
        mesh = make_mesh(
            data=data_shards, sweep=1, devices=_jax.devices()[:data_shards]
        )
        variables, infer_raw, shard_fn = make_sharded_infer(
            model, mesh, variables
        )
        infer = AotGate(
            infer_raw, aot_cache, ("infer_sharded", repr(model), data_shards),
            label="infer",
        )
        device_img_store = False
    else:
        infer = AotGate(
            make_infer_step(model), aot_cache, ("infer", repr(model)),
            label="infer",
        )
    if session is not None and session.get("infer_key") != infer_key:
        session["infer_key"] = infer_key
        session["infer"] = infer
        session["shard_fn"] = shard_fn
        if shard_fn is not None:
            session["sharded_variables"] = variables
        session.pop("infer_views", None)  # geometry changed: rebuild lazily
    if session is not None:
        store = session.setdefault(
            "store", _DeviceImageStore() if device_img_store else None
        )
        if not device_img_store:
            store = None
    else:
        store = _DeviceImageStore() if device_img_store else None
    infer_views = None  # built lazily on the first store-served batch
    if session is not None:
        infer_views = session.get("infer_views")

    if warm_thread is not None:
        warm_thread.join()
    if warm_stats.get("total_s", 0) > 1.0:
        print(f"d2h channel warmup: {warm_stats['total_s']:.2f}s total "
              f"(started at save_depth entry, overlapped with setup)")
    _mark("d2h_warmup")

    acquisition_folder = testpath.rstrip("/").split("/")[-1]
    outdir_acq = os.path.join(outdir, acquisition_folder)

    from ..utils.misc import get_powers

    gen_bits = set(get_powers(debug_depth_gen))
    debug_dir = os.path.join(outdir_acq, "debug_depth_gen")
    # per-view global cloud accumulation (/root/reference/eval.py:432-440);
    # the reference only consumes it for visualization, so we accumulate
    # only when a cloud bit is on to keep stage A memory-flat otherwise
    accumulate_cloud = bool({"2", "3"} & gen_bits)
    vertices: list[np.ndarray] = []
    vertex_colors: list[np.ndarray] = []

    gen_times: list[float] = []  # per-VIEW forward time (batch dt / n_real)
    first_batch_views = [0]  # views in batch 0 (compile) — excluded from steady
    writer = ThreadPoolExecutor(max_workers=2)
    pending = []
    view_idx = 0
    n_views_total = len(test_dataset)

    # per-scan completion notification: when the LAST view of a scan has
    # been emitted AND its artifact writes have flushed, fire on_scan_done
    # (eval.py overlaps stage B of finished scans with stage A of later
    # ones — the device idles most of host-bound stage A). The notifier is
    # single-threaded so callbacks fire in scan order.
    scan_views_left: dict[str, int] = {}
    scan_futures: dict[str, list] = {}
    notifier = None
    if on_scan_done is not None:
        for meta in getattr(test_dataset, "metas", []):
            scan_views_left[meta[0]] = scan_views_left.get(meta[0], 0) + 1
        notifier = ThreadPoolExecutor(max_workers=1)

    def _view_done(scan: str, write_future) -> None:
        if on_scan_done is None or scan not in scan_views_left:
            return
        scan_futures.setdefault(scan, []).append(write_future)
        scan_views_left[scan] -= 1
        if scan_views_left[scan] == 0:
            futs = scan_futures.pop(scan)

            def flush_then_notify(scan=scan, futs=futs):
                for f in futs:
                    f.result()
                on_scan_done(scan)

            pending.append(notifier.submit(flush_then_notify))
    from ..data.pipeline import BackgroundLoader

    # Pipelined dispatch, depth 2: infer(batch k) is dispatched (async) and
    # its device->host copy is ISSUED IMMEDIATELY (copy_to_host_async runs
    # as soon as the device finishes), while up to two batches stay in
    # flight before the host materializes the oldest. The D2H copy — the
    # dominant and most variance-prone phase through the remote-TPU tunnel
    # (fetch swung 9.5-191 s per 49-view scan across sessions) — thus
    # overlaps the NEXT batches' decode/dispatch/emit instead of
    # serializing after them. Steady-state wall per batch is
    # max(device fwd, host decode+write, D2H copy), not their sum.
    import collections as _collections

    inflight: "_collections.deque" = _collections.deque()
    inflight_depth = 2

    def _start_fetch(outputs):
        for arr in (outputs["depth"], outputs["photometric_confidence"]):
            if hasattr(arr, "copy_to_host_async"):
                arr.copy_to_host_async()
        return outputs

    last_done_t = [None]

    def _materialize(entry):
        outputs, sample, n_real, t0 = entry
        depths = np.asarray(outputs["depth"])
        confidences = np.asarray(outputs["photometric_confidence"])
        # THROUGHPUT accounting: with up to ``inflight_depth`` batches in
        # flight, dispatch->materialize would count pipeline latency, not
        # cost — use the time between successive completions instead (first
        # completion falls back to its own dispatch time).
        now = time.time()
        dt = now - (last_done_t[0] if last_done_t[0] is not None else t0)
        last_done_t[0] = now
        gen_times.extend([dt / n_real] * n_real)
        return sample, n_real, depths, confidences, dt

    def _emit_batch(done):
        nonlocal view_idx
        sample, n_real, depths, confidences, dt = done
        K_b = sample.get("intrinsics")
        E_b = sample.get("extrinsics")
        if K_b is None:
            raise ValueError(
                "eval dataset must return intrinsics/extrinsics "
                "(use dataset='dataloader_eval')"
            )
        for b in range(n_real):
            depth = depths[b]
            confidence = confidences[b]
            view_idx += 1
            print(
                f"Iter {view_idx}/{n_views_total} "
                f"(fwd pass in {dt / n_real:.3f}s)"
            )

            # depth/confidence range summary (/root/reference/eval.py:399-407)
            print(
                "depth Min/Max: {:.1f}/{:.1f} - conf. Min/Max: {:.1f}%/{:.1f}%".format(
                    np.min(depth), np.max(depth),
                    np.min(confidence) * 100, np.max(confidence) * 100,
                )
            )
            print(
                "confidence percentiles: 25%:{:.1f}% 50%:{:.1f}% 75%:{:.1f}% 90%:{:.1f}%".format(
                    np.percentile(confidence, 25) * 100,
                    np.percentile(confidence, 50) * 100,
                    np.percentile(confidence, 75) * 100,
                    np.percentile(confidence, 90) * 100,
                )
            )

            filename_tpl = sample["filename"][b]
            ref_img = sample["imgs"][b, 0]
            K = K_b[b][0]
            E = E_b[b][0]
            wf = writer.submit(
                _write_view, outdir_acq, filename_tpl, ref_img, depth,
                confidence, K, E,
            )
            pending.append(wf)
            _view_done(filename_tpl.split("/")[0], wf)

            if gen_bits:
                _dump_depth_gen_debug(
                    debug_dir, view_idx - 1, gen_bits, ref_img, depth, confidence
                )
            if accumulate_cloud:
                from ..geometry.transforms import depth_to_world_points
                from ..io.images import resize_img

                world = np.asarray(
                    depth_to_world_points(
                        jnp.asarray(depth.astype(np.float32)),
                        jnp.asarray(np.asarray(K, np.float32)),
                        jnp.asarray(np.asarray(E, np.float32)),
                        xy_scale=1.0,
                    )
                )
                h, w = depth.shape
                colors = resize_img(np.asarray(ref_img), (h, w)).reshape(-1, 3)
                vertices.append(world)
                vertex_colors.append(
                    (np.clip(colors, 0, 1) * 255).astype(np.uint8)
                )
                if "2" in gen_bits:
                    os.makedirs(debug_dir, exist_ok=True)
                    from ..io.ply import write_ply as _wp

                    _wp(
                        os.path.join(
                            debug_dir, f"cloud_view{view_idx - 1:0>4}.ply"
                        ),
                        world, vertex_colors[-1],
                    )

    pack_cache: dict = (
        session.setdefault("pack_cache", {}) if session is not None else {}
    )
    it = iter(BackgroundLoader(
        loader, transform=lambda b: _pack_u8(b, cache=pack_cache)
    ))
    batch_idx = -1
    last_call = None  # (fn, args) of the newest dispatch, for the probe
    _mark("pre_loop")
    while True:
        batch_idx += 1
        sample = next(it, None)
        _mark("loader_wait")
        if sample is None:
            break
        if batch_idx == 0 and debug_bitmask:
            from ..utils.debug_dump import debug_forward

            dbg_imgs = sample["imgs"]
            if dbg_imgs.dtype == np.uint8:
                dbg_imgs = dbg_imgs.astype(np.float32) / 255.0
            debug_forward(
                model, variables, dbg_imgs, sample["proj_matrices"],
                sample["depth_values"], debug_bitmask, outdir_acq,
            )
            _mark("debug_dump")
        imgs_b = sample.get("imgs_dev", sample["imgs"])
        projs_b = sample["proj_matrices"]
        dv_b = sample["depth_values"]
        n_real = imgs_b.shape[0]
        if batch_idx == 0:
            first_batch_views[0] = n_real
        dev_imgs = store.gather(sample, n_real) if store is not None else None
        if n_real < batch_size:
            # pad the trailing partial batch by repeating the last view so
            # the jitted infer keeps a single compiled shape
            pad = batch_size - n_real
            imgs_b = np.concatenate([imgs_b, np.repeat(imgs_b[-1:], pad, 0)])
            projs_b = np.concatenate([projs_b, np.repeat(projs_b[-1:], pad, 0)])
            dv_b = np.concatenate([dv_b, np.repeat(dv_b[-1:], pad, 0)])
            if dev_imgs is not None:
                nv = sample["view_ids"].shape[1]
                dev_imgs = dev_imgs + dev_imgs[-nv:] * pad
        t0 = time.time()
        if dev_imgs is not None:
            if infer_views is None:
                from ..train.state import make_infer_step_views

                nv = sample["view_ids"].shape[1]
                infer_views = AotGate(
                    make_infer_step_views(model, batch_size, nv),
                    aot_cache, ("infer_views", repr(model), batch_size, nv),
                    label="infer_views",
                )
                if session is not None:
                    session["infer_views"] = infer_views
            call = (infer_views, (
                variables, tuple(dev_imgs), jnp.asarray(projs_b),
                jnp.asarray(dv_b),
            ))
        elif shard_fn is not None:
            call = (infer, (variables,) + shard_fn(imgs_b, projs_b, dv_b))
        else:
            call = (infer, (
                variables, jnp.asarray(imgs_b), jnp.asarray(projs_b),
                jnp.asarray(dv_b),
            ))
        outputs = call[0](*call[1])
        last_call = call
        _mark("dispatch")
        inflight.append((_start_fetch(outputs), sample, n_real, t0))
        if len(inflight) > inflight_depth:
            done = _materialize(inflight.popleft())
            _mark("fetch")
            _emit_batch(done)
            _mark("emit")
    while inflight:
        done = _materialize(inflight.popleft())
        _mark("fetch")
        _emit_batch(done)
        _mark("emit")
    for f in pending:
        f.result()
    writer.shutdown()
    if notifier is not None:
        notifier.shutdown()
    _mark("writer_drain")
    # Device-busy probe (VERDICT r3): one extra timed inference outside the
    # pipeline (empty queue, inputs already device-resident) = honest device
    # compute + result-sync per batch; stage A wall / (probe x batches)
    # tells how busy the chip actually was during host-bound stage A.
    device_probe = device_busy_frac = None
    if last_call is not None and gen_times:
        import jax as _jax

        t0 = time.time()
        _jax.block_until_ready(last_call[0](*last_call[1]))
        device_probe = time.time() - t0
        n_batches = -(-len(gen_times) // batch_size)
        stage_a_wall = sum(phases.values())
        if stage_a_wall > 0:
            device_busy_frac = min(1.0, device_probe * n_batches / stage_a_wall)
        phases["device_probe"] = time.time() - t0
        t_phase = time.time()
    print(
        "stage A phases (s): "
        + " ".join(f"{k}={v:.2f}" for k, v in phases.items())
    )
    if device_probe is not None:
        print(
            f"device busy: ~{device_probe:.3f} s/batch probe x "
            f"{-(-len(gen_times) // batch_size)} batches / stage A = "
            f"{device_busy_frac:.1%}"
        )
    if store is not None and store.uploads:
        print(
            f"device image store: {store.uploads} uploads for "
            f"{len(gen_times)} views x {NviewGen} slots "
            f"({store._nbytes / 1e6:.0f} MB resident)"
        )

    if accumulate_cloud and vertices:
        # combined all-views cloud (/root/reference/eval.py:470-497)
        from ..io.ply import write_ply

        all_pts = np.concatenate(vertices, axis=0)
        all_cols = np.concatenate(vertex_colors, axis=0)
        print("Combining ALL 3D Pts-clouds.\n")
        if "3" in gen_bits:
            os.makedirs(debug_dir, exist_ok=True)
            write_ply(os.path.join(debug_dir, "cloud_allviews.ply"), all_pts, all_cols)
            from .scene_kit import get_frame_bbox, postprocess_cloud

            _, outer = get_frame_bbox(context=acquisition_folder)
            pts, cols = postprocess_cloud(
                all_pts, all_cols,
                crop_bbox=None if dataset_name == "dtu" else outer,
                voxel_size=5.0,
            )
            write_ply(
                os.path.join(debug_dir, "cloud_allviews_post.ply"), pts, cols
            )

    avg = float(np.mean(gen_times)) if gen_times else 0.0
    # steady state excludes the whole FIRST BATCH (it carries the jit
    # compile; with batch_size > 1 every view of that batch is inflated)
    tail = gen_times[first_batch_views[0]:]
    steady = float(np.mean(tail)) if tail else avg
    print(f"Averaged generation time: {avg}")
    return {
        "avg_gen_time": avg,
        "steady_gen_time": steady,
        "n_views": len(gen_times),
        "outdir_acq": outdir_acq,
        "phases": phases,
        "store_uploads": store.uploads if store is not None else 0,
        "device_s_per_batch_probe": device_probe,
        "device_busy_frac": device_busy_frac,
    }
