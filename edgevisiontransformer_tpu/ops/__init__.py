from . import activations, attention, layers  # noqa: F401
