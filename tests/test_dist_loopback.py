"""jax.distributed actually executed with process_count=2: two localhost
CPU worker processes run the CLI with --dist; gathered output must be
byte-identical to a single-process run (exercises dist.init,
process_shard, gather_blobs and distribute_texts end to end)."""
import sys

sys.path.insert(0, "tools")

from dist_loopback import run_loopback  # noqa: E402


def test_two_process_align_loopback():
    ok, expected, got = run_loopback(nprocs=2, mode="align", n_pairs=4,
                                     length=240)
    assert ok, f"expected {len(expected)}B != got {len(got)}B"
    assert expected  # non-trivial output


def test_two_process_edit_loopback():
    ok, expected, got = run_loopback(nprocs=2, mode="edit", n_pairs=4,
                                     length=240)
    assert ok, f"expected {len(expected)}B != got {len(got)}B"
