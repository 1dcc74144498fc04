from .abstract_transforms import AbstractTransform


class MirrorTransform(AbstractTransform):
    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, **data_dict):
        raise NotImplementedError("import stub")
