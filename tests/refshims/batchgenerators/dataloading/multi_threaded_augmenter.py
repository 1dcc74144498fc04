class MultiThreadedAugmenter:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("import stub")
