import importlib


def get_class(path):
    module, name = path.rsplit(".", 1)
    return getattr(importlib.import_module(module), name)


def instantiate(config, *args, **kwargs):
    if config is None:
        return None
    cfg = dict(config)
    target = cfg.pop("_target_")
    cfg.pop("_recursive_", None)
    kwargs.pop("_recursive_", None)
    cfg.update(kwargs)
    return get_class(target)(*args, **cfg)
