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
                    help="training debug bitmask (reference bit meanings); "
                         "headless TPU runs dump the selected forward stages "
                         "as PNGs under <logdir>/debug_train/ at the "
                         "summary-freq cadence")
parser.add_argument("--pallas_grad", action="store_true",
                    help="route the plane-sweep warp's backward through the "
                         "inverse-warp Pallas TPU kernel (no scatter-add); "
                         "window envelopes are planned over --env_samples "
                         "training samples with margin")
parser.add_argument("--pallas_sweep", action="store_true",
                    help="use the fused Pallas plane-sweep variance kernel "
                         "(requires --dtype bfloat16). Together with "
                         "--pallas_grad this enables the fully paired "
                         "custom-VJP training sweep (ops/paired_sweep.py); "
                         "plan validity accumulates on device and is checked "
                         "at the --summary_freq cadence (--plan_check)")
parser.add_argument("--env_samples", type=int, default=8,
                    help="number of training samples (spread across the "
                         "dataset) used to plan the Pallas kernel window "
                         "envelopes over the rig family")
parser.add_argument("--plan_check", default="raise",
                    choices=["raise", "warn", "off"],
                    help="what to do when a batch's geometry exceeds the "
                         "paired-sweep kernel envelope mid-training "
                         "(gradients would be untrustworthy). Validity is "
                         "accumulated on device and synced every "
                         "summary_freq steps (no per-step host sync), so up "
                         "to summary_freq-1 steps can run on bad gradients "
                         "before the raise; the epoch-end check always "
                         "precedes checkpointing, so no saved checkpoint "
                         "contains unchecked steps. The raise names the "
                         "earliest possibly-affected global step")
parser.add_argument("--flat_features", action="store_true",
                    help="run FeatureNet in the flat block-Toeplitz layout "
                         "(ops/flat_conv.py, ~2x on TPU; same param tree, "
                         "exact up to contraction order)")
parser.add_argument("--flat_costreg", action="store_true",
                    help="run CostRegNet in the flat block-Toeplitz layout "
                         "(ops/flat_conv.py; same param tree)")
parser.add_argument("--pallas_regression", action="store_true",
                    help="fused Pallas softmax-regression kernel at eval "
                         "(training always takes the differentiable XLA "
                         "composite)")
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

    grad_env = sweep_env = None
    if args.pallas_grad or args.pallas_sweep:
        from scene_3dreconstruction_mvsnet_tpu.ops.paired_sweep import (
            suggest_family_envelopes,
        )

        if args.pallas_sweep and args.dtype != "bfloat16":
            parser.error("--pallas_sweep requires --dtype bfloat16")
        # plan window envelopes over a spread of the rig family, not just
        # sample 0 — the kernels do not fall back inside the training VJP
        # (a per-step in-graph validity check backstops family members the
        # planner did not see)
        n = min(args.env_samples, len(train_dataset))
        idxs = np.unique(np.linspace(0, len(train_dataset) - 1, n).astype(int))
        samples = [train_dataset[int(i)] for i in idxs]
        h4, w4 = (samples[0]["imgs"].shape[1] // 4,
                  samples[0]["imgs"].shape[2] // 4)
        senv, genv = suggest_family_envelopes(
            [(s["proj_matrices"], s["depth_values"]) for s in samples], h4, w4
        )
        if args.pallas_grad:
            grad_env = genv
            print(f"pallas_grad envelope ({n} samples + margin): {grad_env}")
        if args.pallas_sweep:
            sweep_env = senv
            print(f"pallas_sweep envelope ({n} samples + margin): {sweep_env}")

    model = MVSNet(
        refine=args.refine,
        depth_chunk=args.depth_chunk,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else None,
        remat=args.remat,
        pallas_grad_env=grad_env,
        pallas_sweep_env=sweep_env,
        flat_features=args.flat_features,
        flat_costreg=args.flat_costreg,
        use_pallas_regression=args.pallas_regression,
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
        plan_check=args.plan_check,
        debug_mvsnet=args.debug_MVSnet,
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
