"""Two-process jax.distributed loopback harness.

Spawns N worker processes on localhost (CPU-only jax), each running the
real CLI with --dist over a shard of the input; process 0 writes the
gathered output. The parent diffs it against a single-process run —
this actually executes dist.init / gather_blobs / distribute_texts with
process_count > 1 (reference has no distribution at all; SURVEY.md §2.6
maps its absence to jax.distributed data parallelism).

Usage: python tools/dist_loopback.py [--nprocs 2] [--mode align]
Exit code 0 iff the distributed output is byte-identical.
"""
from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cpu_env(extra=None):
    env = dict(os.environ)
    # neutralize the axon TPU plugin (sitecustomize gates on this var) so
    # worker processes run CPU-only jax and can share one machine
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if extra:
        env.update(extra)
    return env


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_code(mode, pair_file, out_file, dist=True, time_file=None):
    fn, argv = {
        "align": ("main_align", ["-m", "global", "-W", "128", pair_file]),
        "edit": ("main_edit", ["-m", "global", "-W", "0", pair_file]),
    }[mode]
    if dist:
        argv = argv[:-1] + ["--dist", pair_file]
    # self-reported wall time around the CLI call: excludes python/jax
    # process startup (which would swamp a throughput number) but includes
    # compile (warm via the persistent compilation cache)
    code = f"""
import io, sys, time
from contextlib import redirect_stdout
from bsalign_tpu import cli
from bsalign_tpu.parallel import dist as _dist
if {dist!r}:
    _dist.init()   # coordination handshake outside the timed region
t0 = time.perf_counter()
buf = io.StringIO()
with redirect_stdout(buf):
    cli.{fn}({argv!r})
dt = time.perf_counter() - t0
import jax
if jax.process_index() == 0:
    open({out_file!r}, "w").write(buf.getvalue())
"""
    if time_file:
        code += f"""
open({time_file!r} + str(jax.process_index()), "w").write(str(dt))
"""
    return code


def run_loopback(nprocs=2, mode="align", n_pairs=5, length=300, timeout=600):
    """Returns (ok, expected, got)."""
    tmp = tempfile.mkdtemp(prefix="bsa_dist_")
    pair_file = os.path.join(tmp, "pairs.fa")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_pairs.py"),
         "-n", str(n_pairs), "-l", str(length), "-e", "0.12", "-s", "11",
         "-o", pair_file],
        check=True, env=_cpu_env())

    # single-process expected output (same CPU env, no dist)
    single = os.path.join(tmp, "single.txt")
    sp = subprocess.run(
        [sys.executable, "-c",
         _worker_code(mode, pair_file, single, dist=False)],
        env=_cpu_env({"BSA_NPROCS": "", "BSA_COORD": "", "BSA_PROC_ID": ""}),
        capture_output=True, text=True, timeout=timeout, cwd=REPO)
    if sp.returncode != 0:
        raise RuntimeError(f"single-process run failed:\n{sp.stderr[-2000:]}")
    expected = open(single).read()

    # distributed run: nprocs workers, coordinator on a free port
    port = _free_port()
    outd = os.path.join(tmp, "dist.txt")
    procs = []
    for pid in range(nprocs):
        env = _cpu_env({
            "BSA_COORD": f"127.0.0.1:{port}",
            "BSA_NPROCS": str(nprocs),
            "BSA_PROC_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _worker_code(mode, pair_file, outd)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=REPO))
    errs = []
    for pid, p in enumerate(procs):
        try:
            _, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise RuntimeError(f"worker {pid} timed out")
        if p.returncode != 0:
            errs.append(f"worker {pid} rc={p.returncode}:\n{err[-2000:]}")
    if errs:
        raise RuntimeError("\n".join(errs))
    got = open(outd).read() if os.path.exists(outd) else ""
    return got == expected, expected, got


def run_loopback_timed(nprocs, mode="align", n_pairs=24, length=400,
                       timeout=900, warm=True):
    """Distributed loopback THROUGHPUT: returns (pairs_per_s, per_proc_s).

    pairs/s = n_pairs / max(worker self-reported CLI wall), i.e. the wall
    time of the slowest shard excluding process startup.  `warm=True` runs
    once first so the persistent compilation cache is hot and the measured
    pass reflects steady-state work, not XLA compiles.
    """
    tmp = tempfile.mkdtemp(prefix="bsa_dist_bench_")
    pair_file = os.path.join(tmp, "pairs.fa")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_pairs.py"),
         "-n", str(n_pairs), "-l", str(length), "-e", "0.12", "-s", "11",
         "-o", pair_file],
        check=True, env=_cpu_env())
    rounds = (2 if warm else 1)
    times = None
    for it in range(rounds):
        port = _free_port()
        outd = os.path.join(tmp, f"dist{it}.txt")
        tf = os.path.join(tmp, f"t{it}_")
        procs = []
        for pid in range(nprocs):
            env = _cpu_env({
                "BSA_COORD": f"127.0.0.1:{port}",
                "BSA_NPROCS": str(nprocs),
                "BSA_PROC_ID": str(pid),
            })
            procs.append(subprocess.Popen(
                [sys.executable, "-c",
                 _worker_code(mode, pair_file, outd, dist=nprocs > 1,
                              time_file=tf)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True, cwd=REPO))
        for pid, p in enumerate(procs):
            try:
                _, err = p.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise RuntimeError(f"worker {pid} timed out")
            if p.returncode != 0:
                raise RuntimeError(
                    f"worker {pid} rc={p.returncode}:\n{err[-2000:]}")
        times = [float(open(tf + str(pid)).read()) for pid in range(nprocs)]
    slowest = max(times)
    return n_pairs / slowest, times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--mode", default="align", choices=["align", "edit"])
    ap.add_argument("--bench", action="store_true",
                    help="measure pairs/s instead of checking parity")
    args = ap.parse_args()
    if args.bench:
        rate, times = run_loopback_timed(args.nprocs, args.mode)
        print(f"DIST LOOPBACK BENCH {args.nprocs} procs: {rate:.2f} pairs/s "
              f"(per-proc CLI walls: {[round(t, 2) for t in times]})")
        return 0
    ok, expected, got = run_loopback(args.nprocs, args.mode)
    if ok:
        print(f"DIST LOOPBACK OK ({args.nprocs} procs, mode={args.mode}, "
              f"{len(expected)} bytes)")
        return 0
    print("DIST LOOPBACK MISMATCH")
    print("--- expected ---")
    print(expected[:1000])
    print("--- got ---")
    print(got[:1000])
    return 1


if __name__ == "__main__":
    sys.exit(main())
