from .torch_import import (
    import_torch_state_dict,
    load_torch_checkpoint,
    export_torch_state_dict,
)

__all__ = [
    "import_torch_state_dict",
    "load_torch_checkpoint",
    "export_torch_state_dict",
]
