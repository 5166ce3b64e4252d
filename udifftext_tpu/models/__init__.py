from . import attention, layers, unet  # noqa: F401
