from .allocator import OutOfPagesError, PageAllocator
from .pool import PAGES_AXIS, PagePool, append_to_pages_at_layer, gather_kv_dense, quantize_kv, stack_new_kv
