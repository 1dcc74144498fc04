def pad_nd_image(*args, **kwargs):
    raise NotImplementedError("import stub")
