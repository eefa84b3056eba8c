"""DuckDB SQL generator for XXH64 — the oracle twin of Spark's
``F.xxhash64`` (seed 42).

Spark's xxhash64 is XXH64 over the value's UTF-8 bytes; DuckDB has no
native xxhash, so this module EMITS a SQL expression that computes the
identical 64-bit hash in exact HUGEINT arithmetic (public XXH64 spec,
github.com/Cyan4973/xxHash).  Techniques:

* every multiply is by a constant prime, decomposed into 32-bit limbs
  so no intermediate exceeds HUGEINT's signed-128 range;
* rotations are shift+div pairs (the two halves occupy disjoint bit
  ranges, so no final mod is needed);
* a lambda-based "let" (``list_transform([v], x -> body)[1]``) binds
  every reused subexpression once, keeping the emitted text linear
  (~11 KB) instead of exponentially nested;
* bytes come from ``hex(encode(t))`` parsed pairwise, so unicode
  round-trips exactly like the JVM's UTF-8 encoder.

Validated against Spark's xxhash64 on randomized unicode inputs in
``tests/test_operators.py::test_xxh64_sql_matches_spark``.
"""
import itertools

M64 = 1 << 64
M32 = 1 << 32
P1, P2, P3, P4, P5 = (
    0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
    0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5,
)

_ctr = itertools.count()


def _v(prefix="x"):
    return f"{prefix}{next(_ctr)}"


def let(val, body_fn, prefix="x"):
    v = _v(prefix)
    return f"list_transform([{val}], {v} -> {body_fn(v)})[1]"


def cmul(a, prime):
    """(a * prime) mod 2^64 for a < 2^64; `a` must be CHEAP (var/index)."""
    return (
        f"((({a}) % {M32}) * {prime} + "
        f"(((({a}) // {M32}) * {prime}) % {M32}) * {M32}) % {M64}"
    )


def rot(a, r):
    """rotl64; `a` must be cheap."""
    return f"((({a}) * {1 << r}) % {M64} + (({a}) // {1 << (64 - r)}))"


def xor(a, b):
    return f"xor(({a})::HUGEINT, ({b})::HUGEINT)"


def w8(bs, p):
    """little-endian 8-byte word at 1-based position p (cheap vars)."""
    return " + ".join(
        f"{bs}[CAST(({p})+{j} AS INT)]::HUGEINT * {1 << (8 * j)}" for j in range(8)
    )


def w4(bs, p):
    return " + ".join(
        f"{bs}[CAST(({p})+{j} AS INT)]::HUGEINT * {1 << (8 * j)}" for j in range(4)
    )


def rnd(acc, lane_var):
    """rotl(acc + lane*P2, 31) * P1 — acc and lane must be cheap."""
    t1 = f"(({acc}) + {cmul(lane_var, P2)}) % {M64}"
    return let(t1, lambda t: cmul(f"({rot(t, 31)})", P1), "r")


def xxh64_sql(tok: str, seed: int = 42) -> str:
    """Expression computing UNSIGNED XXH64 of utf8(tok) as HUGEINT."""

    def with_hex(hx):
        bytes_list = (
            f"list_transform(range(1, length({hx}) // 2 + 1), "
            f"k -> CAST(16 * (strpos('0123456789ABCDEF', substr({hx}, 2*k-1, 1)) - 1) "
            f"+ (strpos('0123456789ABCDEF', substr({hx}, 2*k, 1)) - 1) AS HUGEINT))"
        )
        return let(bytes_list, with_bytes, "bs")

    def with_bytes(bs):
        return let(f"len({bs})", lambda n: with_n(bs, n), "n")

    def with_n(bs, n):
        # ---- head ----
        v1i = (seed + P1 + P2) % M64
        v2i = (seed + P2) % M64
        v3i = seed % M64
        v4i = (seed - P1) % M64

        def stripe_body(acc, o):
            lanes = [let(w8(bs, f"({o}+{off})"), lambda L, a=f"{acc}[{i+1}]": rnd(a, L), "L")
                     for i, off in enumerate((1, 9, 17, 25))]
            return "[" + ", ".join(lanes) + "]"

        acc_v, off_v = _v("ac"), _v("of")
        stripes = (
            f"list_reduce(list_prepend([{v1i}::HUGEINT, {v2i}, {v3i}, {v4i}], "
            f"list_transform(range(0, {n} // 32), s -> [CAST(32*s AS HUGEINT)])), "
            f"({acc_v}, {off_v}) -> "
            + let(f"{off_v}[1]", lambda o: stripe_body(acc_v, o), "o")
            + ")"
        )

        def converge(vs):
            h0 = (
                f"(({rot(f'{vs}[1]', 1)}) + ({rot(f'{vs}[2]', 7)}) + "
                f"({rot(f'{vs}[3]', 12)}) + ({rot(f'{vs}[4]', 18)})) % {M64}"
            )

            def mr(h_expr, k):
                if k > 4:
                    return h_expr
                # h = (h ^ rnd(0, v_k)) * P1 + P4
                rnd0 = rnd("0::HUGEINT", f"{vs}[{k}]")
                u = xor(h_expr, rnd0)
                nxt = let(u, lambda uv: f"({cmul(uv, P1)} + {P4}) % {M64}", "u")
                return mr(nxt, k + 1)

            return let(h0, lambda hv: mr(hv, 1), "h")

        head = (
            f"CASE WHEN {n} >= 32 THEN "
            + let(stripes, converge, "vs")
            + f" ELSE {(seed + P5) % M64}::HUGEINT END"
        )

        return let(f"({head} + {n}) % {M64}", lambda h1: with_tail(bs, n, h1), "t")

    def with_tail(bs, n, h1):
        # tail8 fold: positions p0, p0+8, ... while p+7 <= n
        p0 = f"(({n} // 32) * 32 + 1)"

        def step8(h, p):
            lane = let(w8(bs, p), lambda L: rnd("0::HUGEINT", L), "L")
            u = xor(h, lane)
            return let(u, lambda uv: let(f"({rot(uv, 27)})",
                                         lambda r8: f"({cmul(r8, P1)} + {P4}) % {M64}", "r"), "u")

        av, xv = _v("a8"), _v("p8")
        tail8 = (
            f"list_reduce(list_prepend([{h1}], "
            f"list_transform(range(0, ({n} - ({p0} - 1)) // 8), "
            f"j -> [CAST({p0} + 8*j AS HUGEINT)])), "
            f"({av}, {xv}) -> [" + step8(f"{av}[1]", f"{xv}[1]::INT") + "])[1]"
        )

        def with_h2(h2):
            r4s = f"({p0} + (({n} - ({p0} - 1)) // 8) * 8)"

            def step4(h, p):
                prod = let(w4(bs, p), lambda wv: cmul(wv, P1), "w")
                u = xor(h, prod)
                return let(u, lambda uv: let(f"({rot(uv, 23)})",
                                             lambda r4: f"({cmul(r4, P2)} + {P3}) % {M64}", "r"), "u")

            return let(
                r4s,
                lambda rv: let(
                    f"CASE WHEN {n} - ({rv} - 1) >= 4 THEN " + step4(h2, rv)
                    + f" ELSE {h2} END",
                    lambda h3: with_h3(bs, n, h3, f"({rv} + CASE WHEN {n} - ({rv} - 1) >= 4 THEN 4 ELSE 0 END)"),
                    "h3",
                ),
                "rs",
            )

        return let(tail8, with_h2, "h2")

    def with_h3(bs, n, h3, b0):
        def stepb(h, p):
            u = xor(h, f"({bs}[CAST({p} AS INT)]::HUGEINT * {P5}) % {M64}")
            return let(u, lambda uv: let(f"({rot(uv, 11)})",
                                         lambda rb: cmul(rb, P1), "r"), "u")

        av, xv = _v("ab"), _v("pb")
        bfold = (
            f"list_reduce(list_prepend([{h3}], "
            f"list_transform(range(CAST({b0} AS INT), CAST({n} AS INT) + 1), p -> [CAST(p AS HUGEINT)])), "
            f"({av}, {xv}) -> [" + stepb(f"{av}[1]", f"{xv}[1]::INT") + "])[1]"
        )
        return let(bfold, avalanche, "h4")

    def avalanche(h):
        a1 = xor(h, f"({h}) // {1 << 33}")
        s = let(a1, lambda v: cmul(v, P2), "a")
        s = let(s, lambda v: let(xor(v, f"({v}) // {1 << 29}"),
                                 lambda v2: cmul(v2, P3), "a"), "a")
        return let(s, lambda v: xor(v, f"({v}) // {1 << 32}"), "a")

    return let(f"upper(hex(encode({tok})))", with_hex, "hx")


