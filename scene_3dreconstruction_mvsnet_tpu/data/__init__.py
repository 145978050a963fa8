"""Dataset registry (name -> MVSDataset class), mirroring the reference's
``find_dataset_def`` dynamic import (/root/reference/datasets/__init__.py:5-8),
plus the host input pipeline."""

import importlib

from .pipeline import Loader, BackgroundLoader, prefetch_to_device

_DATASET_MODULES = {
    "dtu_yao": ".dtu_yao",
    "blender": ".blender",
    "dtu_yao_eval": ".dtu_yao_eval",
    "blender_eval": ".blender_eval",
    "dataloader_eval": ".dataloader_eval",
}


def find_dataset_def(dataset_name: str):
    """Resolve a dataset name to its MVSDataset class."""
    try:
        rel = _DATASET_MODULES[dataset_name]
    except KeyError:
        raise KeyError(
            f"unknown dataset {dataset_name!r}; available: {sorted(_DATASET_MODULES)}"
        )
    module = importlib.import_module(rel, package=__name__)
    return getattr(module, "MVSDataset")


__all__ = ["find_dataset_def", "Loader", "BackgroundLoader", "prefetch_to_device"]
