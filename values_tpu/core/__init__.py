from . import nifti
from .io import subfiles, load_pickle, save_pickle, load_json, save_json
from .seed import set_seed, root_key

__all__ = [
    "nifti", "subfiles", "load_pickle", "save_pickle", "load_json",
    "save_json", "set_seed", "root_key",
]
