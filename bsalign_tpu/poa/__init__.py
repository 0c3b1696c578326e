"""BSPOA: banded striped partial-order alignment, consensus and SNV calling."""
