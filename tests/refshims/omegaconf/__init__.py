"""omegaconf shim: import surface for reference modules; the oracle
passes plain dicts everywhere."""
import contextlib


class DictConfig(dict):
    pass


class ListConfig(list):
    pass


class OmegaConf:
    @staticmethod
    def create(obj=None):
        return DictConfig(obj or {})

    @staticmethod
    def to_container(obj, resolve=True):
        return dict(obj)

    @staticmethod
    def to_yaml(obj):
        import yaml
        return yaml.safe_dump(dict(obj))


@contextlib.contextmanager
def open_dict(cfg):
    yield cfg
