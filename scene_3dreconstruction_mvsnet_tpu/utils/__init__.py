from .misc import (
    get_powers,
    print_args,
    make_recursive_func,
    to_numpy,
    to_float,
    DictAverageMeter,
)

__all__ = [
    "get_powers",
    "print_args",
    "make_recursive_func",
    "to_numpy",
    "to_float",
    "DictAverageMeter",
]
