"""Page allocator unit tests (SURVEY.md §4 item 2).

Page 0 is the reserved dump page (``PageAllocator.DUMP_PAGE``): invalid
writes are redirected there, so the allocator must never hand it out.
"""

import pytest

from pagedattention_based_transformer_decoder_inference_framework_tpu.kvcache.allocator import (
    OutOfPagesError,
    PageAllocator,
)
from pagedattention_based_transformer_decoder_inference_framework_tpu.kvcache.native import (
    NativePageAllocator,
    native_available,
)

PyPageAllocator = PageAllocator


# every test runs against both the Python allocator and the C++ one
# (csrc/page_allocator.cpp via ctypes) — identical semantics required
@pytest.fixture(name="PageAllocator", params=["python", "native"])
def _allocator_cls(request):
    if request.param == "native":
        if not native_available():
            pytest.skip("native allocator toolchain unavailable")
        return NativePageAllocator
    return PyPageAllocator


def test_alloc_free_cycle(PageAllocator):
    a = PageAllocator(5)
    pages = a.alloc_many(4)
    assert sorted(pages) == [1, 2, 3, 4]       # page 0 reserved
    with pytest.raises(OutOfPagesError):
        a.alloc()
    a.free(pages[0])
    assert a.alloc() == pages[0]


def test_dump_page_never_allocated(PageAllocator):
    a = PageAllocator(3)
    assert PageAllocator.DUMP_PAGE not in a.alloc_many(2)
    with pytest.raises(OutOfPagesError):
        a.alloc()


def test_refcount_fork_and_cow(PageAllocator):
    a = PageAllocator(5)
    pages = a.alloc_many(2)
    shared = a.fork(pages)
    assert shared == pages
    assert a.refcount(pages[0]) == 2

    # COW: shared page must be copied before write
    page, copied = a.ensure_exclusive(pages[0])
    assert copied and page not in pages
    assert a.refcount(pages[0]) == 1
    # pages[1] still has refcount 2, so it must copy too
    page2, copied2 = a.ensure_exclusive(pages[1])
    assert copied2
    # free both views fully
    a.free(pages[0])
    a.free(pages[1])
    a.free(page)
    a.free(page2)
    assert a.num_free == 4


def test_double_free_raises(PageAllocator):
    a = PageAllocator(3)
    p = a.alloc()
    a.free(p)
    with pytest.raises(ValueError):
        a.free(p)


def test_lru_prefix_reuse(PageAllocator):
    a = PageAllocator(3)
    p = a.alloc()
    a.free(p, tag=("prefix", 123))
    # freed page is reclaimable by tag
    assert a.lookup_freed(("prefix", 123)) == p
    a.free(p)
    # once evicted for a fresh alloc, tag lookup misses
    a.free(a.alloc(), tag=("prefix", 9))
    a.alloc_many(2)  # forces LRU eviction of the tagged page
    assert a.lookup_freed(("prefix", 9)) is None


def test_live_pages_never_evicted(PageAllocator):
    """Unlike the reference's LRU (kv_tile_cache.cpp:90-98), live pages
    are never dropped — allocation fails instead."""
    a = PageAllocator(3)
    a.alloc_many(2)
    with pytest.raises(OutOfPagesError):
        a.alloc()


def test_resize_grow_and_shrink(PageAllocator):
    a = PageAllocator(4)
    pages = a.alloc_many(2)
    a.resize(8)                                # grow: new pages usable
    assert a.num_free == 8 - 1 - 2             # page 0 reserved, 2 live
    more = a.alloc_many(5)
    for p in more:
        a.free(p)
    with pytest.raises(ValueError):
        a.resize(2)                            # would drop live pages
    for p in pages:
        a.free(p)
    a.resize(2)                                # all free: shrink ok
    assert a.num_free == 1
