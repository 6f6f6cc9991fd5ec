from .allocator import PageAllocator, OutOfPagesError
from .pool import PagePool, append_to_pages

__all__ = ["PageAllocator", "OutOfPagesError", "PagePool", "append_to_pages"]
