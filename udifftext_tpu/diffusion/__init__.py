from . import schedules, denoiser, guiders, sampling  # noqa: F401
