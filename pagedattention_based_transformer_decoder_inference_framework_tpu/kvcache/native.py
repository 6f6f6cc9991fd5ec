"""ctypes bindings for the native (C++) page allocator.

Builds ``csrc/page_allocator.cpp`` into a shared library on first use
(cached next to the source, rebuilt when the source is newer) and wraps
it in a class with the exact :class:`~.allocator.PageAllocator` API, so
the scheduler can use either interchangeably.

Why native: allocator calls sit on the scheduler's admission path (one
``alloc_many``/``free``/``lookup_freed`` burst per request); at high
request rates the Python dict/OrderedDict bookkeeping is measurable
host overhead. The reference keeps this machinery in C++ for the same
reason (``kv_cache/kv_tile_cache.cpp:65-98``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

from .allocator import OutOfPagesError

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc", "page_allocator.cpp")
_LIB = os.path.join(os.path.dirname(_SRC), "libpage_allocator.so")
_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None


def _load() -> Optional[ctypes.CDLL]:
    """Build (if stale) and load the shared library; None if unavailable."""
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_SRC):
            _build_error = f"source not found: {_SRC}"
            return None
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                # build to a temp path and os.replace: concurrent
                # processes never dlopen a half-written library
                tmp = f"{_LIB}.{os.getpid()}.tmp"
                subprocess.run(
                    ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                     _SRC, "-o", tmp],
                    check=True, capture_output=True, text=True)
                os.replace(tmp, _LIB)
            lib = ctypes.CDLL(_LIB)
        except (OSError, subprocess.CalledProcessError) as e:
            _build_error = getattr(e, "stderr", None) or str(e)
            return None
        lib.pa_create.restype = ctypes.c_void_p
        lib.pa_create.argtypes = [ctypes.c_int]
        lib.pa_destroy.argtypes = [ctypes.c_void_p]
        for name, args in (
            ("pa_num_free", [ctypes.c_void_p]),
            ("pa_num_live", [ctypes.c_void_p]),
            ("pa_alloc", [ctypes.c_void_p]),
            ("pa_alloc_many", [ctypes.c_void_p, ctypes.c_int,
                               ctypes.POINTER(ctypes.c_int)]),
            ("pa_free", [ctypes.c_void_p, ctypes.c_int, ctypes.c_int64,
                         ctypes.c_int]),
            ("pa_fork", [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
                         ctypes.c_int]),
            ("pa_refcount", [ctypes.c_void_p, ctypes.c_int]),
            ("pa_ensure_exclusive", [ctypes.c_void_p, ctypes.c_int,
                                     ctypes.POINTER(ctypes.c_int)]),
            ("pa_lookup_freed", [ctypes.c_void_p, ctypes.c_int64]),
            ("pa_drop_cached", [ctypes.c_void_p]),
            ("pa_num_cached", [ctypes.c_void_p]),
            ("pa_claim", [ctypes.c_void_p, ctypes.c_int]),
            ("pa_resize", [ctypes.c_void_p, ctypes.c_int]),
        ):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int
            fn.argtypes = args
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _tag64(tag: object) -> int:
    """Map a tag to the 64-bit digest space both allocators compare in
    (see ``PageAllocator`` — tags are content digests, not objects)."""
    h = tag if isinstance(tag, int) else hash(tag)
    return ctypes.c_int64(h).value            # wrap to signed 64-bit


class NativePageAllocator:
    """Drop-in replacement for :class:`~.allocator.PageAllocator`."""

    DUMP_PAGE = 0

    def __init__(self, num_pages: int):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                f"native allocator unavailable: {_build_error}")
        self._lib = lib
        self.num_pages = num_pages
        self._h = lib.pa_create(num_pages)

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.pa_destroy(h)
            self._h = None

    @property
    def num_free(self) -> int:
        return self._lib.pa_num_free(self._h)

    @property
    def num_live(self) -> int:
        return self._lib.pa_num_live(self._h)

    @property
    def num_cached(self) -> int:
        return self._lib.pa_num_cached(self._h)

    def claim(self, page: int) -> None:
        if self._lib.pa_claim(self._h, page) != 0:
            raise ValueError(f"cannot claim page {page}")

    def resize(self, new_num_pages: int) -> None:
        if self._lib.pa_resize(self._h, new_num_pages) != 0:
            raise ValueError("cannot shrink below a live page")
        self.num_pages = new_num_pages

    def alloc(self) -> int:
        page = self._lib.pa_alloc(self._h)
        if page < 0:
            raise OutOfPagesError(
                f"page pool exhausted ({self.num_pages} pages live)")
        return page

    def alloc_many(self, n: int) -> List[int]:
        out = (ctypes.c_int * max(n, 1))()
        if self._lib.pa_alloc_many(self._h, n, out) != 0:
            raise OutOfPagesError(
                f"need {n} pages, only {self.num_free} free")
        return list(out[:n])

    def free(self, page: int, tag: Optional[object] = None) -> None:
        has_tag = tag is not None
        rc = self._lib.pa_free(self._h, page,
                               _tag64(tag) if has_tag else 0,
                               1 if has_tag else 0)
        if rc != 0:
            raise ValueError(f"double free of page {page}")

    def fork(self, pages: List[int]) -> List[int]:
        arr = (ctypes.c_int * max(len(pages), 1))(*pages)
        if self._lib.pa_fork(self._h, arr, len(pages)) != 0:
            raise KeyError("fork of non-live page")
        return list(pages)

    def refcount(self, page: int) -> int:
        return self._lib.pa_refcount(self._h, page)

    def ensure_exclusive(self, page: int) -> Tuple[int, bool]:
        out = ctypes.c_int()
        rc = self._lib.pa_ensure_exclusive(self._h, page,
                                           ctypes.byref(out))
        if rc < 0:
            if self.refcount(page) == 0:
                raise KeyError(f"page {page} not live")
            raise OutOfPagesError("no page free for COW copy")
        return out.value, bool(rc)

    def lookup_freed(self, tag: object) -> Optional[int]:
        page = self._lib.pa_lookup_freed(self._h, _tag64(tag))
        return None if page < 0 else page

    def drop_cached(self) -> int:
        return self._lib.pa_drop_cached(self._h)


def make_allocator(num_pages: int, native: str = "auto"):
    """Allocator factory: ``native`` in {"auto", "always", "never"}."""
    if native == "never":
        from .allocator import PageAllocator

        return PageAllocator(num_pages)
    if native == "always":
        return NativePageAllocator(num_pages)
    if native_available():
        return NativePageAllocator(num_pages)
    from .allocator import PageAllocator

    return PageAllocator(num_pages)
