"""Time device-side run-start extraction formulations at bench scale.

The bit-plane RLE encode needs `starts = indices where flat[i] != flat[i-1]`
over ~600M uint8 elements. jnp.nonzero(size=cap) measured ~5.5 s on v5e via
the relay — this probe A/Bs formulations (queue-timed: enqueue N, fetch one).
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from multitalent_tpu.configuration import enable_compilation_cache
    enable_compilation_cache()
    dev = jax.devices()[0]
    n = 47 * 192 * 256 * 256
    cap = 1 << 17
    # sparse coherent bool: ~40k runs
    host = np.zeros(n, np.uint8)
    rs = np.random.RandomState(0)
    pos = np.sort(rs.randint(0, n - 4096, 20000))
    for p in pos:
        host[p:p + rs.randint(16, 2048)] = 1
    flat = jax.device_put(host, dev)

    @jax.jit
    def count(f):
        return 1 + jnp.sum(f[1:] != f[:-1], dtype=jnp.int32)

    @partial(jax.jit, static_argnames=("cap",))
    def enc_nonzero(f, cap):
        bound = jnp.concatenate([jnp.ones((1,), jnp.bool_), f[1:] != f[:-1]])
        return jnp.nonzero(bound, size=cap, fill_value=n)[0].astype(jnp.int32)

    @partial(jax.jit, static_argnames=("cap",))
    def enc_cumsum_scatter(f, cap):
        bound = jnp.concatenate([jnp.ones((1,), jnp.bool_), f[1:] != f[:-1]])
        # exclusive prefix = run index of each boundary
        ranks = jnp.cumsum(bound.astype(jnp.int32)) - 1
        idx = jnp.where(bound, ranks, cap)  # non-boundaries scatter to the pad
        out = jnp.full((cap + 1,), n, jnp.int32)
        out = out.at[idx].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
        return out[:cap]

    @partial(jax.jit, static_argnames=("cap", "blk"))
    def enc_blocked(f, cap, blk=4096):
        """Hierarchical: per-block boundary counts -> block offsets; scatter
        within blocks only (segment-local ranks + block base)."""
        m = n // blk
        b2 = f.reshape(m, blk)
        prev = jnp.concatenate([jnp.zeros((1,), f.dtype), b2[:-1, -1]])
        bound = b2 != jnp.concatenate([prev[:, None], b2[:, :-1]], axis=1)
        bound = bound.at[0, 0].set(True)
        per_block = jnp.sum(bound, axis=1, dtype=jnp.int32)
        base = jnp.cumsum(per_block) - per_block
        ranks = jnp.cumsum(bound.astype(jnp.int32), axis=1) - 1 + base[:, None]
        idx = jnp.where(bound, ranks, cap)
        out = jnp.full((cap + 1,), n, jnp.int32)
        out = out.at[idx.reshape(-1)].set(jnp.arange(n, dtype=jnp.int32),
                                          mode="drop")
        return out[:cap]

    ref = None
    for name, fn in (("count", lambda f: count(f)),
                     ("nonzero", lambda f: enc_nonzero(f, cap)),
                     ("cumsum_scatter", lambda f: enc_cumsum_scatter(f, cap)),
                     ("blocked", lambda f: enc_blocked(f, cap))):
        try:
            out = fn(flat)
            np.asarray(out)  # compile+run
            iters = 3
            t0 = time.time()
            for _ in range(iters):
                out = fn(flat)
            got = np.asarray(out)  # one fetch drains the queue
            dt = (time.time() - t0) / iters
            print(f"{name:16s} {dt*1e3:8.1f} ms", flush=True)
            if name == "nonzero":
                ref = got
            elif ref is not None and got.shape == ref.shape:
                match = np.array_equal(np.sort(got), np.sort(ref))
                print(f"  matches nonzero: {match}", flush=True)
        except Exception as e:
            print(f"{name:16s} FAILED {type(e).__name__}: {str(e)[:150]}",
                  flush=True)


if __name__ == "__main__":
    main()


def blocked_bitmap_variant():
    """Boundary-block bitmap: nonzero only over the per-block nonempty mask;
    boundary positions ride bit-packed block words + host unpack."""
    import jax
    import jax.numpy as jnp
    from multitalent_tpu.configuration import enable_compilation_cache
    enable_compilation_cache()
    dev = jax.devices()[0]
    n = 47 * 192 * 256 * 256
    blk = 256
    m = n // blk
    cap_b = 1 << 16
    host = np.zeros(n, np.uint8)
    rs = np.random.RandomState(0)
    pos = np.sort(rs.randint(0, n - 4096, 20000))
    for p in pos:
        host[p:p + rs.randint(16, 2048)] = 1
    flat = jax.device_put(host, dev)

    @jax.jit
    def pack(f):
        b2 = f.reshape(m, blk)
        prev = jnp.concatenate([jnp.zeros((1,), f.dtype), b2[:-1, -1]])
        left = jnp.concatenate([prev[:, None], b2[:, :-1]], axis=1)
        bound = (b2 != left).at[0, 0].set(True)
        w = bound.reshape(m, blk // 32, 32).astype(jnp.uint32)
        weights = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
        words = jnp.sum(w * weights, axis=-1, dtype=jnp.uint32)
        nonempty = jnp.any(bound, axis=1)
        return words, nonempty

    @jax.jit
    def counts(f):
        b2 = f.reshape(m, blk)
        prev = jnp.concatenate([jnp.zeros((1,), f.dtype), b2[:-1, -1]])
        left = jnp.concatenate([prev[:, None], b2[:, :-1]], axis=1)
        bound = (b2 != left).at[0, 0].set(True)
        return jnp.stack([jnp.sum(bound, dtype=jnp.int32),
                          f[0].astype(jnp.int32),
                          jnp.sum(jnp.any(bound, axis=1),
                                  dtype=jnp.int32)])

    @partial(jax.jit, static_argnames=("cap",))
    def compact(f, cap):
        words, nonempty = pack(f)
        idx = jnp.nonzero(nonempty, size=cap, fill_value=m)[0].astype(jnp.int32)
        payload = jnp.where((idx < m)[:, None],
                            words[jnp.minimum(idx, m - 1)], 0)
        return idx, payload

    c = np.asarray(counts(flat))
    print(f"blocked_bitmap: cnt {c[0]} first {c[1]} nonempty_blocks {c[2]}",
          flush=True)
    idx, payload = compact(flat, cap_b)
    np.asarray(idx)
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        c = counts(flat)
        idx, payload = compact(flat, cap_b)
    i_h = np.asarray(idx)
    p_h = np.asarray(payload)
    dt = (time.time() - t0) / iters
    print(f"blocked_bitmap counts+compact {dt*1e3:8.1f} ms "
          f"(payload {p_h.nbytes/1e6:.2f} MB)", flush=True)
    # host reconstruction + verify vs numpy
    t0 = time.time()
    cnt = int(np.asarray(counts(flat))[0])
    valid = i_h < m
    bits = np.unpackbits(p_h[valid].view(np.uint8), bitorder="little")
    bits = bits.reshape(-1, blk)
    row, col = np.nonzero(bits)
    starts = (i_h[valid][row].astype(np.int64) * blk + col)
    print(f"host reconstruct {time.time()-t0:.3f} s, n_starts {len(starts)}",
          flush=True)
    bound_ref = np.concatenate([[True], host[1:] != host[:-1]])
    ref = np.nonzero(bound_ref)[0]
    assert len(starts) == len(ref) == cnt, (len(starts), len(ref), cnt)
    np.testing.assert_array_equal(starts, ref)
    print("blocked_bitmap MATCHES", flush=True)


if __name__ == "__main__" and os.environ.get("BITMAP") == "1":
    blocked_bitmap_variant()
