#!/usr/bin/env python
"""Training / testing / profiling CLI for the TPU-native MVSNet framework.

Mirrors the reference trainer's argparse surface
(/root/reference/train.py:24-67) — same flag names and mini-DSLs
(--lrepochs "10,12,14:2", --Nlights "3:7") — over the jitted JAX runtime.
"""

import argparse
import os
import random
import sys

import numpy as np

from scene_3dreconstruction_mvsnet_tpu.data import find_dataset_def
from scene_3dreconstruction_mvsnet_tpu.models import MVSNet
from scene_3dreconstruction_mvsnet_tpu.train import Trainer
from scene_3dreconstruction_mvsnet_tpu.utils import print_args

parser = argparse.ArgumentParser(description="TPU-native MVSNet trainer")
parser.add_argument("--mode", default="train", choices=["train", "test", "profile"])
parser.add_argument("--model", default="mvsnet", help="select model")
parser.add_argument("--refine", action="store_true", help="use the refine network")

parser.add_argument("--dataset", default="dtu_yao", choices=["dtu_yao", "blender"])
parser.add_argument("--trainpath", default="", help="train datapath")
parser.add_argument("--testpath", help="test datapath (defaults to trainpath)")
parser.add_argument("--trainlist", default="lists/dtu/train.txt")
parser.add_argument("--testlist", default="lists/dtu/test.txt")
parser.add_argument("--pairfile", default="pair.txt")

parser.add_argument("--epochs", type=int, default=16)
parser.add_argument("--lr", type=float, default=0.001)
parser.add_argument("--lrepochs", type=str, default="10,12,14:2",
                    help="epoch ids to downscale lr and the downscale rate")
parser.add_argument("--wd", type=float, default=0.0, help="weight decay")

parser.add_argument("--batch_size", type=int, default=1)
parser.add_argument("--numdepth", type=int, default=192)
parser.add_argument("--interval_scale", type=float, default=1.06)
parser.add_argument("--Nlights", type=str, default="1:1",
                    help="'k:total' light sampling DSL (blender datasets)")
parser.add_argument("--NtrainViews", type=int, default=3)
parser.add_argument("--NtestViews", type=int, default=5)

parser.add_argument("--loadckpt", default=None)
parser.add_argument("--logdir", default="./outputs/debug")
parser.add_argument("--resume", action="store_true")

parser.add_argument("--summary_freq", type=int, default=100)
parser.add_argument("--save_freq", type=int, default=1)
parser.add_argument("--seed", type=int, default=0, metavar="S", help="0 for random seed")
parser.add_argument("--num_workers", type=int, default=4)

parser.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"],
                    help="conv compute dtype (bfloat16 = TPU fast path)")
parser.add_argument("--depth_chunk", type=int, default=None,
                    help="plane-sweep depth chunk size (bounds peak HBM)")
parser.add_argument("--remat", action="store_true",
                    help="rematerialize the plane sweep in backward "
                         "(needed for the full 512x640/D192 recipe on 16GB)")
parser.add_argument("--debug_MVSnet", type=int, default=0,
                    help="debug bitmask kept for CLI parity (visualization "
                         "windows are not supported in headless TPU runs)")
parser.add_argument("--pallas_grad", action="store_true",
                    help="route the plane-sweep warp's backward through the "
                         "inverse-warp Pallas TPU kernel (no scatter-add); "
                         "the window envelope is planned from the first "
                         "training sample with margin")
parser.add_argument("--flat_features", action="store_true",
                    help="run FeatureNet in the flat block-Toeplitz layout "
                         "(ops/flat_conv.py, ~2x on TPU; same param tree, "
                         "exact up to contraction order)")
parser.add_argument("--img_cache", default=None,
                    help="directory for a pre-decoded image cache; "
                         "multi-epoch training re-decodes the same PNGs "
                         "every epoch and np.load of the decoded array is "
                         "~12x faster on this host (profile_input.py)")
parser.add_argument("--multihost", action="store_true",
                    help="initialize the jax.distributed runtime before any "
                         "backend use (coordinator/process info from the "
                         "standard JAX env vars or TPU-pod autodetection); "
                         "each process then trains data-parallel over the "
                         "global ('data','sweep') mesh")


def main() -> None:
    args = parser.parse_args()
    if args.multihost:
        from scene_3dreconstruction_mvsnet_tpu.parallel import initialize_multihost

        initialize_multihost()
        import jax

        print(
            f"multihost: process {jax.process_index()}/{jax.process_count()}, "
            f"{len(jax.local_devices())} local / {len(jax.devices())} global devices"
        )
    if args.resume:
        assert args.mode == "train", "--resume requires --mode train"
        assert args.loadckpt is None, "--resume and --loadckpt are exclusive"
    if args.testpath is None:
        args.testpath = args.trainpath

    seed = args.seed if args.seed != 0 else random.randint(1, 99999999)
    np.random.seed(seed)

    print("argv:", sys.argv[1:])
    print_args(args)

    MVSDataset = find_dataset_def(args.dataset)
    common = dict(Nlights=args.Nlights, pairfile=args.pairfile, seed=seed,
                  img_cache=args.img_cache)
    train_dataset = MVSDataset(
        args.trainpath, args.trainlist, "train", args.NtrainViews,
        args.numdepth, args.interval_scale, **common,
    )
    test_dataset = MVSDataset(
        args.testpath, args.testlist, "test", args.NtestViews,
        args.numdepth, args.interval_scale, **common,
    )

    import jax.numpy as jnp

    grad_env = None
    if args.pallas_grad:
        from scene_3dreconstruction_mvsnet_tpu.ops.pallas.warp_grad import (
            suggest_grad_envelope,
        )

        sample = train_dataset[0]  # imgs [V, H, W, 3]
        h4, w4 = sample["imgs"].shape[1] // 4, sample["imgs"].shape[2] // 4
        env = suggest_grad_envelope(
            sample["proj_matrices"][1:], sample["proj_matrices"][0],
            sample["depth_values"], h4, w4,
        )
        # margin: the envelope is planned from ONE sample but must cover the
        # whole rig family (the backward kernel does not fall back)
        grad_env = (env["kx"] + 2, env["yspan"] + 4,
                    -(-(env["pr"] + 8) // 8) * 8, env["pcp"])
        print(f"pallas_grad envelope (with margin): {grad_env}")

    model = MVSNet(
        refine=args.refine,
        depth_chunk=args.depth_chunk,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else None,
        remat=args.remat,
        pallas_grad_env=grad_env,
        flat_features=args.flat_features,
    )

    trainer = Trainer(
        model,
        train_dataset,
        test_dataset,
        logdir=args.logdir,
        epochs=args.epochs,
        lr=args.lr,
        lrepochs=args.lrepochs,
        weight_decay=args.wd,
        batch_size=args.batch_size,
        summary_freq=args.summary_freq,
        save_freq=args.save_freq,
        seed=seed,
        num_workers=args.num_workers,
    )

    if args.resume:
        trainer.resume()
    elif args.loadckpt:
        print(f"Loading checkpoint {args.loadckpt}")
        trainer.load(args.loadckpt)

    n_params = sum(
        int(np.prod(np.shape(p)))
        for p in __import__("jax").tree.leaves(trainer.state.params)
    )
    print(f"Number of model parameters: {n_params}")

    if args.mode == "train":
        trainer.train()
    elif args.mode == "test":
        print("final", trainer.test())
    elif args.mode == "profile":
        trainer.profile()


if __name__ == "__main__":
    main()
