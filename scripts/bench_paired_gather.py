"""Probe: paired (slice-size-2) gathers vs per-row takes on TPU.

Motivation (PERF.md): the fine-level hash gather is row-transaction
bound — cost scales with the NUMBER of gathered rows, not bytes. If
the hash places the two x-corners of every interpolation cell in
ADJACENT table rows (additive-x hash, see `ops/hashgrid.py` paired
mode), each point needs 4 two-row slices instead of 8 single-row
gathers — potentially halving the dominant transaction count. This
probe measures whether XLA lowers `lax.gather(slice_sizes=(2, C))`
at the one-transaction cost of a single row on v5e.

Methodology: chain >=32 dependent applications inside one jit and
divide (isolated single-op timings over the axon tunnel carry ~30 ms
RTT — CLAUDE.md). Timing sync via float(jnp.sum(...)).

Usage: python scripts/bench_paired_gather.py [N] [CHAIN]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

S = 1 << 19
C = 8
N = int(sys.argv[1]) if len(sys.argv) > 1 else 3_590_000
CHAIN = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def timed(fn, *args):
    out = jax.jit(fn)(*args)
    float(jnp.sum(out))           # warm compile + real completion
    t0 = time.perf_counter()
    out = jax.jit(fn)(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / CHAIN


def chain(body):
    def fn(tl, idx):
        def step(i, acc):
            # data dependency: perturb indices by the accumulator's
            # parity so the chain cannot be CSE'd. Reduce the FULL
            # output — a single-element tap would let XLA fold the
            # slice into the gather and fetch one row instead of N.
            j = (idx + (acc.astype(jnp.int32) & 1)) % (S - 1)
            return acc + jnp.sum(body(tl, j).astype(jnp.float32))
        return jax.lax.fori_loop(0, CHAIN, step, jnp.float32(0.0))
    return fn


def take_rows(tl, idx):
    """Baseline: 8 single-row gathers per point (current form)."""
    return jnp.take(tl, idx, axis=0).reshape(-1, C)


def paired_gather(tl2, idx4):
    """4 two-row slices per point from an [S+1, C] extended table."""
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0,))
    out = jax.lax.gather(
        tl2, idx4.reshape(-1, 1), dn, slice_sizes=(2, C),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    return out.reshape(-1, C)


def wide_take(tlw, idx4):
    """Control: 4 single-row gathers of 2C-wide rows (pre-paired
    table layout; no slice dimension)."""
    return jnp.take(tlw, idx4, axis=0).reshape(-1, 2 * C)


def main():
    rng = np.random.default_rng(0)
    tl = jnp.asarray(rng.normal(size=(S, C)).astype(np.float32))
    tl2 = jnp.concatenate([tl, tl[:1]], axis=0)          # [S+1, C]
    tlw = tl.reshape(S // 2, 2 * C)                      # [S/2, 2C]
    idx8 = jnp.asarray(
        rng.integers(0, S - 1, size=(N, 8)).astype(np.int32))
    idx4 = jnp.asarray(
        rng.integers(0, S - 1, size=(N, 4)).astype(np.int32))
    idx4h = jnp.asarray(
        rng.integers(0, S // 2 - 1, size=(N, 4)).astype(np.int32))

    t_take = timed(chain(lambda t, j: take_rows(t, j)), tl, idx8)
    t_pair = timed(chain(lambda t, j: paired_gather(tl2, j[:, :4])),
                   tl, idx4)
    t_wide = timed(chain(lambda t, j: wide_take(tlw, j[:, :4] % (S // 2 - 1))),
                   tl, idx4h)
    print(f'N={N} chain={CHAIN}')
    print(f'take 8x[1,{C}]   rows: {t_take * 1e3:8.2f} ms')
    print(f'gather 4x[2,{C}] rows: {t_pair * 1e3:8.2f} ms '
          f'({t_take / max(t_pair, 1e-9):.2f}x)')
    print(f'take 4x[1,{2*C}] rows: {t_wide * 1e3:8.2f} ms '
          f'({t_take / max(t_wide, 1e-9):.2f}x)')


if __name__ == '__main__':
    main()
