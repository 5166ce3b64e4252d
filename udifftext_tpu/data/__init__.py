from .loader import get_dataloader  # noqa: F401
