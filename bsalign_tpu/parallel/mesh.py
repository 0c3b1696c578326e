"""Data-parallel sharding of alignment batches over a device mesh.

Alignment is embarrassingly parallel across pairs (SURVEY.md §2.6): the only
parallel axis is the batch. State tensors are batch-minor ([..., B]) so the
batch shards over the mesh's data axis with zero collectives in the hot loop;
result gathering happens on host after device_get. Multi-host extends this by
sharding the input stream per process (jax.distributed) — the forward program
is identical.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import banded8_jax as K

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devs), (DATA_AXIS,))


def make_sharded_forward(T, W, mode, piecewise, gapo1, gape1, gapo2, gape2,
                         nt_max, nt_min, mesh: Mesh):
    """Jit the banded-8 forward with batch sharded over the mesh data axis.

    Per-argument layouts (batch axis marked 'd'):
      qpad [B,QP]=(d,·)  qlen [B]=(d)  tseq [B,T]=(d,·)  tlen [B]=(d)
      mtx5 [5,4]=repl    rby [T,B]=(·,d)
      init_us/es/qs [W,WS,B]=(·,·,d)  init_ub [WS+1,B]=(·,d)
    """
    fwd = K.make_forward(T, W, mode, piecewise, gapo1, gape1, gapo2, gape2,
                         nt_max, nt_min, jit=False)

    def sh(*spec):
        return NamedSharding(mesh, P(*spec))

    d = DATA_AXIS
    state_sh = sh(None, None, d) if piecewise else None
    in_sh = (
        sh(d, None),            # qpad
        sh(d),                  # qlen
        sh(d, None),            # tseq
        sh(d),                  # tlen
        sh(None, None),         # mtx5
        sh(None, d),            # rby
        sh(None, None, d),      # init_us
        sh(None, None, d) if piecewise else None,       # init_es
        sh(None, None, d) if piecewise == 2 else None,  # init_qs
        sh(None, d),            # init_ub
    )
    return jax.jit(fwd, in_shardings=in_sh)


def make_sharded_edit_forward(T, NW, mode, NWQ, win_chunked, mesh: Mesh):
    """Jit the bit-parallel edit forward with the batch sharded on the mesh
    data axis (layouts: qeq [4,B,NWQ], tseq [B,T], rbegs/movxs [T,B])."""
    from ..ops import edit_jax as KE
    fwd = KE.make_edit_forward(T, NW, mode, NWQ, win_chunked)

    def sh(*spec):
        return NamedSharding(mesh, P(*spec))

    d = DATA_AXIS
    in_sh = (
        sh(None, d, None),      # qeq
        sh(d),                  # qlen
        sh(d, None),            # tseq
        sh(d),                  # tlen
        sh(None, d),            # rbegs
        sh(None, d),            # movxs
    )
    return jax.jit(fwd, in_shardings=in_sh)


def mesh_interpret_default(mesh: Mesh):
    """Pallas interpret-mode default for a mesh: interpret on CPU devices.

    Decided from the mesh's actual devices, NOT jax.default_backend() —
    under the axon TPU plugin the default backend is 'tpu' even when the
    mesh is built from virtual CPU devices (the round-2 dryrun failure)."""
    return mesh.devices.flat[0].platform == "cpu"


def make_sharded_pallas_forward(T, W, mode, piecewise, gapo1, gape1, gapo2,
                                gape2, nt_max, nt_min, mesh: Mesh,
                                BL=128, Rs=None, interpret=None):
    """Shard the Pallas banded-8 kernel over the mesh data axis.

    The kernel's leading operand axis is the batch-block (NB); shard_map
    splits it so every device runs the same Mosaic program on its local
    blocks — zero collectives (alignment is embarrassingly parallel).
    Returns (run, prepare): `prepare` packs operands exactly like the
    single-chip adapter; `run(*ops)` executes sharded.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from ..ops import banded8_pallas as KP

    if interpret is None:
        interpret = mesh_interpret_default(mesh)
    fwd = KP.make_forward(T, W, mode, piecewise, gapo1, gape1, gapo2, gape2,
                          nt_max, nt_min, BL=BL, Rs=Rs, interpret=interpret)

    def prepare(*args):
        return fwd.prepare(*args)

    d = DATA_AXIS

    def run(call, ops):
        # The kernel program is compiled per batch-block count; inside
        # shard_map each device sees only its local NB/nsh blocks, so the
        # global `call` from prepare() is rebuilt for the local block count
        # (same cached program across devices — SPMD).
        nsh = mesh.devices.size
        NB, NCH = ops[0].shape[0], ops[0].shape[1]
        pad = (-NB) % nsh
        if pad:
            # pad with copies of the last block (valid pair data, results
            # discarded) so the block count divides the mesh; strip below
            repl_ix = (4, 5)  # m8, r0 replicate; everything else is [NB,…]
            ops = tuple(
                o if i in repl_ix else
                np.concatenate([o, np.repeat(o[-1:], pad, axis=0)], axis=0)
                for i, o in enumerate(ops))
        NBp = NB + pad
        Tp = ops[1].shape[1] * Rs          # tsk is [NB, Tp//Rs, Rs, BL]
        m8 = np.asarray(ops[4])
        off = ~np.eye(4, dtype=bool)
        uniform = bool(np.all(np.diag(m8[:4, :4]) == m8[0, 0])
                       and np.all(m8[:4, :4][off] == m8[0, 1]))
        local_call = KP._get_call(
            T, W, mode, piecewise, gapo1, gape1, gapo2, gape2, nt_max,
            nt_min, BL, Rs, NCH, Tp, NBp // nsh, uniform, bool(interpret))
        sharded = P(d)
        repl = P()
        # qch/tseq/rby/qltz + per-pair init state shard on the leading
        # batch-block axis; mtx5 and row0 replicate
        in_specs = (sharded, sharded, sharded, sharded, repl, repl,
                    sharded, sharded, sharded, sharded, sharded)
        n_pl = 1 if piecewise == 0 else (2 if piecewise == 1 else 3)
        out_specs = tuple(sharded for _ in range(2 * n_pl + 4))
        try:
            f = shard_map(local_call, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
        except TypeError:  # older jax spelling
            f = shard_map(local_call, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_rep=False)
        outs = jax.jit(f)(*ops)
        if pad:
            outs = tuple(o[:NB] for o in outs)
        return outs

    return run, prepare


def sharded_pedit_forward(jobs, mesh: Mesh, Rs=16, interpret=None):
    """Run the POA remsa pedit Pallas kernel with the job batch sharded
    over the mesh data axis (jobs are (window, read) realignments —
    embarrassingly parallel). Same per-job outputs as
    ops.pedit_pallas.pedit_forward_batch."""
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    from ..ops import pedit_pallas as PP

    if interpret is None:
        interpret = mesh_interpret_default(mesh)
    nsh = mesh.devices.size
    bw, HW = jobs[0].bw, jobs[0].HW
    R1 = max(8, -(-len(jobs) // nsh))
    R = R1 * nsh
    nsteps = max(2 * (j.mend - j.mbeg) - 1 for j in jobs)
    NT = -(-(nsteps + 1) // Rs)
    init, feed = PP.pack_jobs(jobs, R, Rs, NT)
    call = PP._get_call(bw, HW, R1, Rs, NT, bool(interpret))
    d = DATA_AXIS

    def local(i, f):
        return call(i, f)

    in_specs = (P(None, d, None), P(None, None, d, None))
    out_specs = (P(None, d, None), P(None, d, None))
    try:
        f = shard_map(local, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, check_vma=False)
    except TypeError:
        f = shard_map(local, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, check_rep=False)
    o0, o1 = jax.jit(f)(init, feed)
    return PP.unpack_jobs(jobs, np.asarray(o0), np.asarray(o1))
