from .burrito import Burrito

__all__ = ["Burrito"]
