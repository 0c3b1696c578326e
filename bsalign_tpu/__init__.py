"""bsalign-tpu: a TPU-native sequence-alignment framework.

A from-scratch reimplementation of the capabilities of ruanjue/bsalign
(banded striped 8-bit pairwise alignment, bit-parallel edit distance with
kmer-synteny guidance, and BSPOA multiple alignment / consensus / SNV
calling), redesigned batch-first for TPUs with jax/XLA/Pallas compute and
data-parallel scaling over device meshes.
"""

__version__ = "0.1.0"
