"""Sequence encoding and FASTA/FASTQ I/O.

TPU-first counterpart of the reference's dna.h BaseBank/SeqBank and
filereader.h FASTA/Q parser (dna.h:13-58 base tables, filereader.h:609
readseq). Sequences are held as NumPy uint8 arrays of 2-bit codes; batch
packing for device transfer lives in bsalign_tpu/align.
"""
from __future__ import annotations

import gzip
import io
from dataclasses import dataclass, field
from typing import Iterator, List, Tuple

import numpy as np

# base -> 2bit code; everything unknown -> 4 (N) (dna.h:13-32)
_BASE_BIT = np.full(256, 4, dtype=np.uint8)
for _i, _c in enumerate("ACGT"):
    _BASE_BIT[ord(_c)] = _i
    _BASE_BIT[ord(_c.lower())] = _i

BIT_BASE = "ACGTN-acgtn*"  # dna.h:59


def encode_dna(seq: str | bytes, mask_n: bool = True) -> np.ndarray:
    """Encode an ASCII DNA string to 0..3 codes (N -> 0 when mask_n, mirroring
    2-bit BaseBank packing where code 4 & 3 == 0)."""
    if isinstance(seq, str):
        seq = seq.encode()
    codes = _BASE_BIT[np.frombuffer(seq, dtype=np.uint8)]
    if mask_n:
        codes = codes & 3
    return codes.astype(np.uint8)


def decode_dna(codes: np.ndarray) -> str:
    return "".join(BIT_BASE[c] for c in codes)


def revcomp_codes(codes: np.ndarray) -> np.ndarray:
    return (3 - codes[::-1]).astype(np.uint8)


@dataclass
class SeqRecord:
    tag: str
    desc: str
    seq: str
    qual: str | None = None

    @property
    def codes(self) -> np.ndarray:
        return encode_dna(self.seq)


def _open_maybe_gz(path: str) -> io.TextIOBase:
    with open(path, "rb") as probe:
        magic = probe.read(2)
    if magic == b"\x1f\x8b":
        return io.TextIOWrapper(gzip.open(path, "rb"))
    return open(path, "rt")


def read_fastx(path_or_handle) -> Iterator[SeqRecord]:
    """Stream FASTA/FASTQ records (plain or gzip). Parser behavior mirrors
    filereader.h:609-744: format sniffed per-record from '>' / '@'."""
    if isinstance(path_or_handle, str):
        handle = _open_maybe_gz(path_or_handle)
        owns = True
    else:
        handle = path_or_handle
        owns = False
    try:
        line = handle.readline()
        while line:
            line = line.rstrip("\n")
            if not line:
                line = handle.readline()
                continue
            if line.startswith(">"):
                header = line[1:]
                parts = header.split(None, 1)
                tag = parts[0] if parts else ""
                desc = parts[1] if len(parts) > 1 else ""
                chunks: List[str] = []
                line = handle.readline()
                while line and not line.startswith((">", "@")):
                    chunks.append(line.strip())
                    line = handle.readline()
                yield SeqRecord(tag, desc, "".join(chunks))
            elif line.startswith("@"):
                header = line[1:]
                parts = header.split(None, 1)
                tag = parts[0] if parts else ""
                desc = parts[1] if len(parts) > 1 else ""
                seq = handle.readline().strip()
                handle.readline()  # '+'
                qual = handle.readline().strip()
                yield SeqRecord(tag, desc, seq, qual)
                line = handle.readline()
            else:
                line = handle.readline()
    finally:
        if owns:
            handle.close()


def write_fasta(handle, tag: str, seq: str, width: int = 0) -> None:
    handle.write(f">{tag}\n")
    if width and width > 0:
        for i in range(0, len(seq), width):
            handle.write(seq[i : i + width] + "\n")
    else:
        handle.write(seq + "\n")


@dataclass
class SeqBank:
    """Named read set: list-of-arrays analog of dna.h:1179-1260 SeqBank."""

    tags: List[str] = field(default_factory=list)
    seqs: List[np.ndarray] = field(default_factory=list)

    def push(self, tag: str, seq: str | np.ndarray) -> None:
        self.tags.append(tag)
        if isinstance(seq, str):
            self.seqs.append(encode_dna(seq))
        else:
            self.seqs.append(np.asarray(seq, dtype=np.uint8) & 3)

    def __len__(self) -> int:
        return len(self.seqs)

    def clear(self) -> None:
        self.tags.clear()
        self.seqs.clear()
