from .model import TransMotion, TransMotionConfig  # noqa: F401
