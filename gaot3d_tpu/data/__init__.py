from .transforms import rescale, rescale_new, normalize

__all__ = ["rescale", "rescale_new", "normalize"]
