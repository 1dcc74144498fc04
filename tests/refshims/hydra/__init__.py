"""hydra shim: `_target_` instantiation only (what the reference's
inference/eval paths use at runtime)."""
from . import utils  # noqa: F401


def main(*args, **kwargs):
    def deco(fn):
        return fn
    return deco
