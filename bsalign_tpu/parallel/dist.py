"""Multi-host data parallelism: process init, input sharding, host gather.

Alignment is embarrassingly parallel across pairs / POA windows
(SURVEY.md §2.6), so the multi-host story is purely data-parallel:

  1. every process calls :func:`init` (jax.distributed over DCN);
  2. the input work list is split per process (:func:`process_shard`);
  3. each process runs the normal single-host batched engines on its
     shard (the device programs are identical at any host count);
  4. variable-length results (TSV blocks, CIGARs, MSAs) are gathered to
     every host as byte blobs (:func:`gather_blobs`) and the original
     order is restored; process 0 emits output.

Enable on the CLI with --dist (or BSA_DIST=1). Coordinator discovery
follows jax.distributed.initialize's environment autodetection (TPU
pods set it from the runtime); explicit settings come from
BSA_COORD / BSA_NPROCS / BSA_PROC_ID.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

_INITIALIZED = False


def enabled_by_env() -> bool:
    return bool(os.environ.get("BSA_DIST"))


def init(coordinator: Optional[str] = None,
         num_processes: Optional[int] = None,
         process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed once per process (no-op on re-entry).

    With no arguments, jax autodetects the coordinator from the TPU/cluster
    environment; BSA_COORD/BSA_NPROCS/BSA_PROC_ID override for manual
    CPU/GPU launches."""
    global _INITIALIZED
    if _INITIALIZED:
        return
    import jax
    coordinator = coordinator or os.environ.get("BSA_COORD")
    if num_processes is None and os.environ.get("BSA_NPROCS"):
        num_processes = int(os.environ["BSA_NPROCS"])
    if process_id is None and os.environ.get("BSA_PROC_ID"):
        process_id = int(os.environ["BSA_PROC_ID"])
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True


def process_info():
    """(process_index, process_count) — valid after init (or single-proc)."""
    import jax
    return jax.process_index(), jax.process_count()


def process_shard(n_items: int) -> range:
    """Contiguous slice of [0, n_items) owned by this process."""
    pid, pcnt = process_info()
    per = -(-n_items // pcnt)
    lo = min(pid * per, n_items)
    hi = min(lo + per, n_items)
    return range(lo, hi)


def gather_blobs(local_blobs: Sequence[bytes]) -> List[List[bytes]]:
    """All-gather variable-length byte blobs across processes.

    Returns blobs[pid][i] for every process, so callers can reassemble
    results in input order. Single-process: returns [list(local_blobs)].
    Uses a two-phase allgather (lengths, then padded payload) over the
    global device mesh — the only cross-host communication in the
    framework, and it happens once per CLI run, off the hot path."""
    import jax
    if jax.process_count() == 1:
        return [list(local_blobs)]
    from jax.experimental import multihost_utils as mh

    cat = b"".join(local_blobs)
    lens = np.array([len(b) for b in local_blobs], np.int64)
    hdr = np.zeros(2, np.int64)
    hdr[0] = len(lens)
    hdr[1] = len(cat)
    hdrs = np.asarray(mh.process_allgather(hdr))          # [P, 2]
    max_n = int(hdrs[:, 0].max())
    max_b = int(hdrs[:, 1].max())
    lens_pad = np.zeros(max_n, np.int64)
    lens_pad[:len(lens)] = lens
    all_lens = np.asarray(mh.process_allgather(lens_pad))  # [P, max_n]
    pay = np.zeros(max_b, np.uint8)
    pay[:len(cat)] = np.frombuffer(cat, np.uint8)
    all_pay = np.asarray(mh.process_allgather(pay))        # [P, max_b]
    out: List[List[bytes]] = []
    for p in range(all_pay.shape[0]):
        n = int(hdrs[p, 0])
        blobs, off = [], 0
        for i in range(n):
            ln = int(all_lens[p, i])
            blobs.append(all_pay[p, off:off + ln].tobytes())
            off += ln
        out.append(blobs)
    return out


def distribute_texts(items_total: int,
                     local_texts: Sequence[str]) -> Optional[List[str]]:
    """Gather per-item text results; returns the full ordered list on
    process 0 and None elsewhere."""
    import jax
    blobs = gather_blobs([t.encode() for t in local_texts])
    if jax.process_index() != 0:
        return None
    full: List[Optional[str]] = [None] * items_total
    pcnt = len(blobs)
    for p in range(pcnt):
        per = -(-items_total // pcnt)
        lo = min(p * per, items_total)
        for k, blob in enumerate(blobs[p]):
            full[lo + k] = blob.decode()
    return [t if t is not None else "" for t in full]
