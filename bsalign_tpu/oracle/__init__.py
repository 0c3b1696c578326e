"""Scalar NumPy reference oracles.

These replicate the reference engines' *semantics* bit-for-bit (including the
int8 saturating arithmetic, striped score anchors and adaptive band
steering) so that the batched TPU engines can be validated cell-exactly.
They are not performance code.
"""
