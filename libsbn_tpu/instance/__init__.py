from .rooted import RootedInstance
from .unrooted import UnrootedInstance

__all__ = ["RootedInstance", "UnrootedInstance"]
