from .abstract_transforms import AbstractTransform


class GaussianNoiseTransform(AbstractTransform):
    """Import stub: the oracle test does not run the TTA path (noise
    draws cannot match across frameworks)."""

    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, **data_dict):
        raise NotImplementedError(
            "TTA noise is out of scope for the reference oracle")
