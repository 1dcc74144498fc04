from .node import Config, make_config, merge, resolve
from .loader import compose, load_config_file
from .instantiate import instantiate, locate, TARGET_ALIASES

__all__ = [
    "Config", "make_config", "merge", "resolve",
    "compose", "load_config_file",
    "instantiate", "locate", "TARGET_ALIASES",
]
