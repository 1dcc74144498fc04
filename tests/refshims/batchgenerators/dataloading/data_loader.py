class DataLoader:
    """Import/subclass stub (the reference's NumpyDataLoader subclasses
    this at module import; the oracle never instantiates it)."""

    def __init__(self, *args, **kwargs):
        pass


SlimDataLoaderBase = DataLoader
