"""Measured collective payloads: count the bytes each collective actually
moves in a compiled program, from its jaxpr.

VERDICT r3 weak #4: the analytic comm model (`parallel/comm_model.py`) was
validated only by one loose wall-clock ratio — its per-tier
`tier_bytes_per_iteration` numbers were derived BY READING the shard_map
programs, never cross-checked against them. This module walks a traced
jaxpr, finds every collective primitive (psum, all_gather, ppermute, pmin,
pmax, all_to_all, reduce_scatter), and sums the per-device operand bytes —
so `bench_scaling.py` can assert analytic == instrumented within tolerance
(SCALING_r04 carries the comparison).

Conventions (match `comm_model.tier_bytes_per_iteration`):
- psum/pmin/pmax: payload = per-device INPUT bytes (the contribution each
  participant puts on the wire; ring-allreduce cost scaling is applied by
  the model, not here).
- all_gather: per-device input bytes (the model's `payload_gather` is the
  gathered TOTAL = input x axis size; the cross-check multiplies).
- ppermute: per-device input bytes.
- scan bodies multiply by the trip count; while_loop bodies count ONCE
  (per-iteration accounting — the model is also per-iteration) and are
  flagged in the result.
"""
from __future__ import annotations

import jax

__all__ = ["collective_payload_bytes", "compiled_collective_count",
           "COLLECTIVE_PRIMS"]

COLLECTIVE_PRIMS = ("psum", "all_gather", "ppermute", "pmin", "pmax",
                    "all_to_all", "reduce_scatter")


def _aval_bytes(v):
    aval = v.aval
    n = 1
    for s in getattr(aval, "shape", ()):
        n *= int(s)
    return n * getattr(aval, "dtype", jax.numpy.float32).itemsize


def _walk(jaxpr, mult, out):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        # vma-checked shard_map traces psum as psum_invariant etc.
        if name.endswith("_invariant"):
            name = name[: -len("_invariant")]
        if name in COLLECTIVE_PRIMS:
            b = sum(_aval_bytes(v) for v in eqn.invars
                    if hasattr(v, "aval"))
            rec = out.setdefault(name, {"count": 0, "bytes": 0})
            rec["count"] += mult
            rec["bytes"] += mult * b
            continue
        p = eqn.params
        if name == "scan":
            _walk(p["jaxpr"].jaxpr, mult * int(p["length"]), out)
        elif name == "while":
            wm = out.get("_while_mult", 1)
            if wm == 1:
                out["while_loops_counted_once"] = True
            else:
                out["while_loops_counted_x"] = wm
            # wm applies to THIS loop's body only — clearing it before the
            # recursion keeps nested while_loops counted once instead of
            # compounding wm**depth (ADVICE r4 low #2)
            out["_while_mult"] = 1
            _walk(p["body_jaxpr"].jaxpr, mult * wm, out)
            _walk(p["cond_jaxpr"].jaxpr, mult * wm, out)
            out["_while_mult"] = wm
        elif name == "cond":
            # branches may differ; take the max over branches per prim and
            # ADD it to the outer accumulation (ADVICE r4 medium: the old
            # compare/replace against `out` dropped or clobbered bytes
            # accumulated OUTSIDE the cond when a primitive appeared both
            # before and inside one)
            branch_outs = []
            for br in p["branches"]:
                bo = {"_while_mult": out.get("_while_mult", 1)}
                _walk(br.jaxpr, mult, bo)
                bo.pop("_while_mult", None)
                branch_outs.append(bo)
            keys = {k for bo in branch_outs for k in bo}
            for k in keys:
                vs = [bo[k] for bo in branch_outs if k in bo]
                if not isinstance(vs[0], dict):
                    out[k] = vs[0]
                    continue
                worst = max(vs, key=lambda v: v["bytes"])
                rec = out.setdefault(k, {"count": 0, "bytes": 0})
                rec["count"] += worst["count"]
                rec["bytes"] += worst["bytes"]
        else:
            for key in ("jaxpr", "call_jaxpr", "body_jaxpr", "cond_jaxpr"):
                sub = p.get(key)
                if sub is None:
                    continue
                _walk(sub.jaxpr if hasattr(sub, "jaxpr") else sub, mult, out)


def compiled_collective_count(fn, *args, **kwargs) -> dict:
    """Count collective INSTRUCTIONS in the compiled (optimized) HLO — the
    number of distinct collective launches the runtime actually issues per
    execution of the program body (loops excluded: an instruction inside a
    while/scan launches once per iteration; this counts program POINTS).

    Why this exists next to `collective_payload_bytes`: a tupled
    `jax.lax.psum((a, b), axis)` traces as SEPARATE psum eqns per leaf, and
    XLA's all-reduce combiner merges compatible adjacent all-reduces — so
    the jaxpr eqn count neither equals nor bounds the launch count. The
    latency-bound analysis (SCALING online_frontend) needs the compiled
    number."""
    import re
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    txt = compiled.as_text()
    out = {}
    for op in ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all"):
        # count instruction definitions ("= <type> all-reduce(") plus
        # started async forms ("-start("), not operand references
        n = len(re.findall(rf"= [^=\n]*\s{op}(?:-start)?\(", txt))
        if n:
            out[op] = n
    out["total_sites"] = sum(v for k, v in out.items() if k != "total_sites")
    return out


def collective_payload_bytes(fn, *args, while_mult: int = 1,
                             **kwargs) -> dict:
    """Trace `fn(*args, **kwargs)` and return
    {prim: {count, bytes}, total_bytes, ...flags} with per-device operand
    bytes per primitive (see module docstring for conventions).

    `while_mult`: multiplier applied to while_loop bodies. Trip counts are
    dynamic, so the default (1) is a LOWER bound; pass the loop's maximum
    iteration count (e.g. the GN config's `iterations`) for a conservative
    upper bound when the numbers feed a time/efficiency model."""
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    out: dict = {"_while_mult": max(int(while_mult), 1)}
    _walk(closed.jaxpr, 1, out)
    del out["_while_mult"]
    out["total_bytes"] = sum(v["bytes"] for v in out.values()
                             if isinstance(v, dict))
    return out
