"""Disk-resident log-likelihood streaming (``.npy`` → streaming estimators).

The reference ingests the full ``(n_obs, n_draws)`` log-likelihood through
arviz ``InferenceData`` (reference ``pyloo/utils.py:21-79``), which caps the
workflow at host RAM.  The streaming estimators in :mod:`pyloo_tpu.streaming`
remove the *device*-memory cap by evaluating chunks on device; this module
removes the *host*-memory cap for the complementary case where the
log-likelihood already exists as a matrix on disk (exported from another
sampler, a database dump, a previous run): a :class:`NpyLogLik` chunk source
reads it chunk by chunk and every ``*_streaming`` estimator accepts it in
place of the traceable ``log_lik_fn`` callback.

Two readers with identical semantics:

- a **native prefetcher** (``_native/chunk_reader.cpp``): a background C++
  thread ``pread()``s the next chunks into a page-aligned ring while the
  device computes the current one, so disk latency hides under compute;
- a **numpy memmap fallback** used when no C++ compiler is available
  (sequential OS readahead still applies).

Files must be C-order ``.npy`` (any numpy version writes these) with shape
``(n_obs, n_draws)`` or ``(n_obs, n_chains, n_draws)``; the chain axis is
flattened into draws, matching the ``__sample__`` stacking of the in-memory
path.  To *create* a larger-than-RAM file, write through
``np.lib.format.open_memmap(path, mode="w+", shape=..., dtype=...)``.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from ._native import load_library

__all__ = ["NpyLogLik", "loo_from_file", "waic_from_file"]


def _npy_metadata(path: str):
    """(shape, dtype, data_offset) of a C-order .npy file, validated."""
    mm = np.lib.format.open_memmap(path, mode="r")
    try:
        shape, dtype, offset = mm.shape, mm.dtype, mm.offset
        if dtype.kind != "f" or dtype.itemsize not in (4, 8):
            raise ValueError(
                f"log-likelihood file must be float32/float64, got {dtype}"
            )
        if dtype.byteorder not in ("=", "<", "|") or not np.little_endian:
            raise ValueError(
                f"log-likelihood file must be little-endian native, got"
                f" {dtype}"
            )
        if len(shape) not in (2, 3):
            raise ValueError(
                "log-likelihood file must be (n_obs, n_draws) or"
                f" (n_obs, n_chains, n_draws), got shape {shape}"
            )
        if not mm.flags["C_CONTIGUOUS"]:
            raise ValueError(
                "log-likelihood file must be C-order (fortran_order=False)"
            )
        if any(s < 1 for s in shape):
            raise ValueError(f"log-likelihood file has empty axis: {shape}")
    finally:
        del mm  # release the mapping before the readers open their own
    return shape, np.dtype(dtype.str.lstrip("=<|")), offset


class _NativeReader:
    """ctypes wrapper over the C++ ring prefetcher."""

    def __init__(self, lib, path, offset, row_bytes, n_rows, chunk_rows,
                 depth):
        self._lib = lib
        self._handle = lib.cr_open(
            os.fsencode(path), offset, row_bytes, n_rows, chunk_rows, depth
        )
        if not self._handle:
            raise OSError(f"native chunk reader failed to open {path!r}")
        self.chunk_rows = chunk_rows
        self._row_bytes = row_bytes

    def read(self, chunk_index: int, out: np.ndarray) -> int:
        rows = self._lib.cr_read(
            self._handle,
            chunk_index,
            out.ctypes.data_as(ctypes.c_void_p),
        )
        if rows < 0:
            raise OSError(
                f"I/O error reading chunk {chunk_index} from the"
                " log-likelihood file"
            )
        return int(rows)

    @property
    def reads_issued(self) -> int:
        """Chunk preads started since open (a sequential full pass must issue
        exactly n_chunks — more means the pipeline reset and re-read)."""
        return int(self._lib.cr_reads_issued(self._handle)) if self._handle else 0

    def close(self):
        if self._handle:
            self._lib.cr_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover - belt and braces
        try:
            self.close()
        except Exception:
            pass


class _MemmapReader:
    """Same interface as :class:`_NativeReader`, via ``np.memmap``."""

    def __init__(self, path, offset, dtype, n_rows, row_elems, chunk_rows):
        self._mm = np.memmap(
            path, dtype=dtype, mode="r", offset=offset,
            shape=(n_rows, row_elems),
        )
        self.chunk_rows = chunk_rows
        self._n_rows = n_rows

    def read(self, chunk_index: int, out: np.ndarray) -> int:
        start = chunk_index * self.chunk_rows
        if start >= self._n_rows:
            return 0
        stop = min(start + self.chunk_rows, self._n_rows)
        rows = stop - start
        out.reshape(self.chunk_rows, -1)[:rows] = self._mm[start:stop]
        return rows

    def close(self):
        self._mm = None


class NpyLogLik:
    """Chunk source over an on-disk ``(n_obs, n_draws)`` ``.npy`` matrix.

    Pass it to :func:`pyloo_tpu.loo_streaming` (or any ``*_streaming``
    estimator) in place of the traceable ``log_lik_fn``; chunks are read from
    disk — prefetched by the native reader when available — and shipped to
    the device one at a time, so neither host nor device ever holds the full
    matrix.  :func:`loo_from_file` / :func:`waic_from_file` wrap the common
    cases.

    Parameters
    ----------
    path : str
        C-order ``.npy`` file, shape ``(n_obs, n_draws)`` or
        ``(n_obs, n_chains, n_draws)`` (chains flatten into draws), dtype
        float32/float64.
    depth : int
        Ring slots for the native prefetcher (chunks read ahead of the
        consumer). Default 4.
    native : bool, optional
        Force (``True``) or forbid (``False``) the native reader; default
        auto-detects and falls back to ``np.memmap``.
    """

    def __init__(self, path: str, *, depth: int = 4, native: bool | None = None):
        shape, dtype, offset = _npy_metadata(path)
        self.path = path
        self.n_obs = int(shape[0])
        self.n_draws = int(np.prod(shape[1:]))
        self.dtype = dtype
        self._offset = offset
        self._depth = int(depth)
        if self._depth < 1:
            raise ValueError("depth must be >= 1")
        lib = load_library() if native in (None, True) else None
        if native is True and lib is None:
            raise RuntimeError(
                "native=True but the chunk-reader library is unavailable"
                " (no C++ compiler, or PYLOO_TPU_NO_NATIVE is set)"
            )
        self._lib = lib
        self._reader = None
        self.is_native = lib is not None

    def _ensure_reader(self, chunk_rows: int):
        if self._reader is not None and self._reader.chunk_rows == chunk_rows:
            return self._reader
        if self._reader is not None:
            self._reader.close()
        row_bytes = self.n_draws * self.dtype.itemsize
        if self._lib is not None:
            self._reader = _NativeReader(
                self._lib, self.path, self._offset, row_bytes, self.n_obs,
                chunk_rows, self._depth,
            )
        else:
            self._reader = _MemmapReader(
                self.path, self._offset, self.dtype, self.n_obs,
                self.n_draws, chunk_rows,
            )
        return self._reader

    def read_rows(self, start_row: int, n_rows: int) -> np.ndarray:
        """``(n_rows, n_draws)`` chunk starting at ``start_row``.

        ``start_row`` must be a multiple of ``n_rows`` (the streaming loops'
        access pattern); rows past the end of the file repeat the last file
        row — the same padding the traceable-callback path produces by
        clamping indices, and masked out by every streaming accumulator.
        """
        if n_rows < 1:
            raise ValueError("n_rows must be positive")
        if start_row % n_rows:
            raise ValueError(
                f"start_row ({start_row}) must be a multiple of the chunk"
                f" size ({n_rows})"
            )
        reader = self._ensure_reader(n_rows)
        out = np.empty((n_rows, self.n_draws), self.dtype)
        got = reader.read(start_row // n_rows, out)
        if got == 0:
            raise ValueError(
                f"chunk starting at row {start_row} is past the end of the"
                f" file ({self.n_obs} rows)"
            )
        if got < n_rows:
            out[got:] = out[got - 1]
        return out

    @property
    def reads_issued(self) -> int | None:
        """Chunk preads issued by the native reader (``None`` on the memmap
        fallback or before the first read)."""
        if isinstance(self._reader, _NativeReader):
            return self._reader.reads_issued
        return None

    def gather_rows(self, idx) -> np.ndarray:
        """``(len(idx), n_draws)`` rows at arbitrary observation indices.

        Random access for the subsampling estimators (they score a handful
        of sampled rows exactly); served by a short-lived memmap — prefetch
        buys nothing for scattered reads.
        """
        idx = np.asarray(idx)
        if idx.ndim != 1 or (idx.size and (idx.min() < 0
                                           or idx.max() >= self.n_obs)):
            raise ValueError(
                f"indices must be 1-D within [0, {self.n_obs})"
            )
        mm = np.memmap(
            self.path, dtype=self.dtype, mode="r", offset=self._offset,
            shape=(self.n_obs, self.n_draws),
        )
        try:
            return np.array(mm[idx])
        finally:
            del mm

    def close(self):
        if self._reader is not None:
            self._reader.close()
            self._reader = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def loo_from_file(path: str, *, depth: int = 4, native: bool | None = None,
                  **kwargs):
    """PSIS-LOO over an on-disk ``.npy`` log-likelihood matrix.

    Equivalent to ``loo(...)`` on the same matrix loaded in memory (same
    ELPDData, same warnings), but host memory stays O(chunk): the file is
    streamed through :func:`pyloo_tpu.loo_streaming`.  All ``loo_streaming``
    keyword arguments (``reff``, ``pointwise``, ``method``, ``chunk_size``,
    ``mesh``, ``checkpoint_path``, ...) pass through.

    The file's chain structure is flattened, so ``reff`` defaults to 1.0 —
    pass the relative efficiency from your sampler to match ``loo()`` on
    multi-chain posteriors (reference ``pyloo/loo.py:204-216`` estimates it
    from the posterior group).
    """
    from .streaming import loo_streaming

    with NpyLogLik(path, depth=depth, native=native) as src:
        return loo_streaming(src, src.n_obs, src.n_draws, **kwargs)


def waic_from_file(path: str, *, depth: int = 4, native: bool | None = None,
                   **kwargs):
    """WAIC over an on-disk ``.npy`` log-likelihood matrix (streamed)."""
    from .streaming import waic_streaming

    with NpyLogLik(path, depth=depth, native=native) as src:
        return waic_streaming(src, src.n_obs, src.n_draws, **kwargs)
