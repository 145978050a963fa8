"""Small host-side utilities mirroring the reference's utils surface
(/root/reference/utils.py): recursive pytree mappers, scalar aggregation,
and the debug-bitmask decoder."""

from __future__ import annotations

from typing import Any, Callable

import numpy as np


def get_powers(n: int) -> list[str]:
    """Decode a debug bitmask into the list of set bit positions (as strings).

    E.g. get_powers(6) == ["1", "2"]. Mirrors the 3 debug flag families of
    the reference (--debug_MVSnet / --debug_depth_gen / --debug_depth_filter,
    /root/reference/models/mvsnet.py:7-8)."""
    return [str(p) for p, v in enumerate(bin(n)[:1:-1]) if int(v)]


def print_args(args: Any) -> None:
    """Pretty-print an argparse namespace or dataclass."""
    print("#" * 32 + "  args  " + "#" * 32)
    items = vars(args).items() if hasattr(args, "__dict__") else dict(args).items()
    for k, v in items:
        print("{0: <18}\t{1: <30}\t{2: <20}".format(k, str(v), str(type(v))))
    print("#" * 72)


def make_recursive_func(func: Callable) -> Callable:
    """Lift a leaf function to act recursively on nested dict/list/tuple."""

    def wrapper(vars):
        if isinstance(vars, list):
            return [wrapper(x) for x in vars]
        if isinstance(vars, tuple):
            return tuple(wrapper(x) for x in vars)
        if isinstance(vars, dict):
            return {k: wrapper(v) for k, v in vars.items()}
        return func(vars)

    return wrapper


@make_recursive_func
def to_numpy(x):
    """Device array / scalar -> host numpy (recursive)."""
    if isinstance(x, np.ndarray) or isinstance(x, (str, bytes, float, int)) or x is None:
        return x
    return np.asarray(x)


@make_recursive_func
def to_float(x):
    """Scalar array -> python float (recursive)."""
    if isinstance(x, float):
        return x
    return float(np.asarray(x))


class DictAverageMeter:
    """Running mean of a dict of float scalars
    (/root/reference/utils.py:105-124)."""

    def __init__(self) -> None:
        self.data: dict[str, float] = {}
        self.count = 0

    def update(self, new_input: dict[str, float]) -> None:
        self.count += 1
        for k, v in new_input.items():
            if not isinstance(v, float):
                raise TypeError(f"DictAverageMeter expects float values, got {k}: {type(v)}")
            self.data[k] = self.data.get(k, 0.0) + v

    def mean(self) -> dict[str, float]:
        return {k: v / self.count for k, v in self.data.items()}
