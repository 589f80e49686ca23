from . import checkpoint, hf_import, imagenet  # noqa: F401
