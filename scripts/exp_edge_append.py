"""Why does the edge append cost 20-25% of the blocked pass?

exp_b8_attribution.py: ablating the 3 dynamic_update_slice edge appends
saves 0.50-0.55 ms/lap at B=16/32 (~0.5 GB/s-scale traffic for ~128 KB of
arrays) and is implicated in the B=8 cliff. This microbench isolates the
pattern: a scan whose body appends BN rows into capacity-E arrays at a
dynamic base, vs alternatives (static-stride block slots, scatter,
smaller capacity, scan-ys emission).
"""
import time

import jax
import jax.numpy as jnp


def slope(make_fn, k1, k2, reps=3):
    f1, f2 = make_fn(k1), make_fn(k2)
    _ = float(f1()); _ = float(f2())
    t1 = t2 = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); _ = float(f1())
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter(); _ = float(f2())
        t2 = min(t2, time.perf_counter() - t0)
    return (t2 - t1) / (k2 - k1)


def bench(name, body_fn, nb, k=(4, 32)):
    def make(kk):
        @jax.jit
        def run():
            def outer(c, _):
                def inner(carry, i):
                    return body_fn(carry, i, c)
                (op, ol, oxy, n), _ = jax.lax.scan(
                    inner, (jnp.zeros((CAP_E,), jnp.int32),
                            jnp.zeros((CAP_E,), jnp.int32),
                            jnp.zeros((CAP_E, 2), jnp.float32),
                            jnp.int32(0)),
                    jnp.arange(nb))
                return c + op[0] + n, op[0]
            out, _ = jax.lax.scan(outer, jnp.int32(0), None, length=kk)
            return out
        return run
    s = slope(make, *k)
    print(f"{name:34s} {s*1e3:8.3f} ms/lap-equivalent", flush=True)


BN = 256
CAP_E = 8192


def main():
    global CAP_E
    rows_p = jnp.arange(BN, dtype=jnp.int32)
    rows_xy = jnp.zeros((BN, 2), jnp.float32)

    def dyn_dus(carry, i, c):
        op, ol, oxy, n = carry
        base = jnp.minimum(n, CAP_E - BN)
        op = jax.lax.dynamic_update_slice(op, rows_p + i + c, (base,))
        ol = jax.lax.dynamic_update_slice(ol, rows_p + i, (base,))
        oxy = jax.lax.dynamic_update_slice(oxy, rows_xy + i, (base, 0))
        return (op, ol, oxy, n + BN), ()

    def static_slots(carry, i, c):
        # block i owns rows [i*BN, (i+1)*BN): base is i*BN — still traced,
        # but a multiple of the update size (alignment may matter)
        op, ol, oxy, n = carry
        base = jnp.minimum(i * BN, CAP_E - BN)
        op = jax.lax.dynamic_update_slice(op, rows_p + i + c, (base,))
        ol = jax.lax.dynamic_update_slice(ol, rows_p + i, (base,))
        oxy = jax.lax.dynamic_update_slice(oxy, rows_xy + i, (base, 0))
        return (op, ol, oxy, n + BN), ()

    def scatter(carry, i, c):
        op, ol, oxy, n = carry
        base = jnp.minimum(n, CAP_E - BN)
        to = base + rows_p
        op = op.at[to].set(rows_p + i + c)
        ol = ol.at[to].set(rows_p + i)
        oxy = oxy.at[to].set(rows_xy + i)
        return (op, ol, oxy, n + BN), ()

    def no_append(carry, i, c):
        op, ol, oxy, n = carry
        return (op, ol, oxy, n + BN + op[0] * 0 + (rows_p + i + c)[0] * 0), ()

    for nb, tag in ((12, "B=32(nb=12)"), (46, "B=8(nb=46)")):
        print(f"-- {tag}, E={CAP_E}")
        bench(f"{tag} dynamic-base DUS", dyn_dus, nb)
        bench(f"{tag} static-stride DUS", static_slots, nb)
        bench(f"{tag} scatter", scatter, nb)
        bench(f"{tag} no-append", no_append, nb)
    CAP_E = 4096
    print(f"-- E={CAP_E}")
    bench("B=32 dynamic-base DUS E=4096", dyn_dus, 12)
    bench("B=8  dynamic-base DUS E=4096", dyn_dus, 46)


if __name__ == "__main__":
    main()
