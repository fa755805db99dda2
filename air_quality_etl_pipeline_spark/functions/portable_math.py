"""Engine-portable transcendental math on integer counts.

Why this exists
---------------
The corpus-scoring queries quantize per-token log-probabilities to
``DECIMAL(18,9)`` so group sums are order-independent, then round the
group mean at 6 decimals (``round_portable``).  Both steps are
deterministic — but only given the *same input double*.  ``ln`` is
transcendental: Spark evaluates it with the JVM's ``Math.log`` and
DuckDB with C libm's ``log``, and the two are each allowed (and
observed) to differ by 1 ulp on the same argument.  A 1-ulp input
difference flips the DECIMAL(18,9) cell whenever the true value lies
within ~1 ulp of a 0.5e-9 boundary — probability ≈ 2·ulp/cell ≈ 4e-7
per *distinct* evaluation, but a single flipped cell fans out to every
document containing that n-gram, and each affected document then
re-rolls a ~1e-2 lottery at the final 6-decimal rounding (the doc mean
moves by cell/n_grams ≈ 1e-8 against a 1e-6 grid).  Measured at
sf0.1: 3 of 5000 documents in ``bigram_logprob_score`` differed from
the DuckDB oracle by exactly 1e-6.  The driver gate at sf0.01 never
hits it; a 100-TB corpus hits it constantly.

The fix is not a tolerance — the correctness harness hash-compares
values — but a *portable* ``ln`` built only from operations that IEEE
754 requires to be correctly rounded (+, −, ×, ÷) plus exact integer
steps, evaluated in the same order by both engines, so the result is
bit-identical by construction:

1. ``e = length(bin(n)) - 1`` — ``floor(log2 n)`` from the binary
   string length: pure integer, exact in both engines (no libm
   ``log2``, whose 1-ulp misrounding at powers of two is exactly the
   hazard the order-stats carve had to defend against).
2. ``2^e`` via integer bit-shift (``shiftleft`` / ``<<``) — exact for
   e ≤ 62; the cast to double is exact below 2^53.
3. ``m = n / 2^e ∈ [1, 2)`` — exact (n < 2^53 means the quotient's
   mantissa is n's mantissa).
4. ``ln m = 2·atanh(z), z = (m−1)/(m+1) ∈ [0, 1/3)`` by the odd
   series ``2z·Σ z^{2j}/(2j+1)``, 19 terms, Horner in ``w = z²`` with
   a fixed parenthesization.  Every step is a correctly-rounded IEEE
   double op; Java bytecode never contracts ``a*b+c`` into an FMA and
   DuckDB executes each SQL ``*``/``+`` as a separate vectorized
   kernel, so no engine can fuse or reorder.  Truncation error
   ≤ (1/3)^39/39 ≈ 1e-20; accumulated rounding ≈ 1e-16 relative
   (measured max 2.2e-16 against ``math.log`` over 15k integers
   including every 2^k±1 band edge).
5. ``ln n = e·LN2 + ln m`` with ``LN2`` the correctly-rounded double
   literal — the same literal parsed to the same double by Scala,
   Python and DuckDB.

SQL-literal pitfall: DuckDB parses a bare decimal literal
(``0.693...``) as DECIMAL and then does decimal-contaminated
arithmetic — every float constant in the SQL twin must be written
``CAST('0.693…' AS DOUBLE)`` (verified: the bare-literal form diverges
from Spark in the last ulp on ~10% of inputs; the cast form is
bit-identical on all tested inputs).

Scale shape: everything here is a per-row projection of built-in
expressions — whole-stage-codegen'd, no shuffle, no Python.  The
callers apply it to *count-aggregate relations* (vocabulary-sized),
not token streams, and non-integer ratios are expressed as
``ln(a) − ln(b)`` with exact small-integer scaling (0.4 = 2/5 →
``ln(2a) − ln(5b)``), which keeps every argument a positive int64.

Reference parity: the reference's scoring measures round through
Power BI's fixed-decimal types and never cross-check two engines, so
they never face this; the hazard is born from this repo's dual-engine
correctness gate itself.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 1/(2j+1) for the atanh odd series; z < 1/3 ⇒ 19 terms give
# truncation ≤ (1/3)^39/39 ≈ 1e-20, far below double resolution.
_ATANH_COEF: list[float] = [1.0 / (2 * j + 1) for j in range(19)]

#: Correctly-rounded double nearest ln 2 (= 0x1.62e42fefa39efp-1).
LN2: float = 0.6931471805599453


def _sql_d(x: float) -> str:
    """A SQL double literal DuckDB will not type as DECIMAL."""
    return f"CAST({x!r} AS DOUBLE)"


def ln_int_portable(col: Column) -> Column:
    """Bit-portable ``ln(n)`` for a positive int64 column ``n`` < 2^53.

    Produces the identical double in Spark and DuckDB (via
    :func:`sql_ln_int`) — see the module docstring for the argument.
    The caller must guarantee ``n ≥ 1``; 0/negative/NULL inputs yield
    NULL or garbage by design (counts are ≥ 1 wherever this is used).

    Catalyst performs subexpression elimination inside whole-stage
    codegen, so the repeated ``z``/``w`` nodes below evaluate once per
    row.
    """
    n = col.cast("long")
    e = (F.length(F.bin(n)) - F.lit(1)).cast("int")
    # F.shiftleft's Python wrapper wants an int literal for numBits;
    # the underlying SQL function accepts a column — call it directly.
    p2 = F.call_function("shiftleft", F.lit(1).cast("long"), e).cast("double")
    m = n.cast("double") / p2
    z = (m - F.lit(1.0)) / (m + F.lit(1.0))
    w = z * z
    s = F.lit(_ATANH_COEF[-1])
    for c in reversed(_ATANH_COEF[:-1]):
        s = s * w + F.lit(c)
    return e.cast("double") * F.lit(LN2) + (F.lit(2.0) * z) * s


def sql_ln_int(expr: str) -> str:
    """The DuckDB twin of :func:`ln_int_portable` as an inline SQL
    expression over ``expr`` (a positive-int64-valued SQL expression).

    Mirrors the Spark expression op-for-op with the same
    parenthesization and the same (DOUBLE-cast) literals.  The
    expansion repeats the ``w`` subexpression per Horner term — apply
    it to *aggregate* relations (one row per distinct n-gram), never
    to token streams, both for plan hygiene and text size.
    """
    e = f"(length(bin(CAST({expr} AS BIGINT))) - 1)"
    p2 = f"CAST((CAST(1 AS BIGINT) << {e}) AS DOUBLE)"
    m = f"(CAST({expr} AS DOUBLE) / {p2})"
    z = f"(({m} - {_sql_d(1.0)}) / ({m} + {_sql_d(1.0)}))"
    w = f"({z} * {z})"
    s = _sql_d(_ATANH_COEF[-1])
    for c in reversed(_ATANH_COEF[:-1]):
        s = f"({s} * {w} + {_sql_d(c)})"
    return (
        f"(CAST({e} AS DOUBLE) * {_sql_d(LN2)}"
        f" + ({_sql_d(2.0)} * {z}) * {s})"
    )


def quantize_micro9(col: Column) -> Column:
    """Quantize a double to int64 *nano-units* (1e-9) portably.

    Route through ``DECIMAL(18,9)`` — the double→decimal cast is the
    one decimal conversion both engines perform identically (verified
    across the whole registry) — then scale by 1e9 inside DECIMAL
    (18+10+1 = 29 digits, no precision-loss rescale) and cast the now
    integral value to BIGINT exactly.  Do NOT cast double→bigint
    directly: Spark truncates, DuckDB rounds.

    Int64 micro-units exist to dodge two decimal-arithmetic traps the
    dual-engine gate exposed at sf0.1:

    * Spark multiplies ``DECIMAL(18,9) × BIGINT`` at precision
      18+20+1 = 39 > 38 and, under its default precision-loss rule,
      **rescales the product to 8 decimals** (rounding it); DuckDB
      types the same product ``DECIMAL(36,9)`` and keeps it exact.
      Group sums then differ by ~1e-9 between the engines.
    * casting a ``DECIMAL(38,9)`` sum to DOUBLE is correctly rounded
      in Spark (BigDecimal) but double-rounds through the scaled
      int128 in DuckDB once the scaled integer exceeds 2^53.

    Integer micro-units make every downstream multiply/sum exact and
    engine-agnostic (sum as BIGINT while provably < 9.2e18, else as
    DECIMAL(38,0)/HUGEINT — both exact integer types).
    """
    return (
        col.cast("decimal(18,9)") * F.lit(1000000000)
    ).cast("long")


def sql_quantize_micro9(expr: str) -> str:
    """DuckDB twin of :func:`quantize_micro9`.

    The quantizing cast targets DECIMAL(18,9) — same as Spark — but
    DuckDB multiplies at the *inputs'* width (int64 storage for
    precision 18) and overflows on ×1e9, so widen to DECIMAL(28,9)
    between the quantize and the scale (a lossless up-cast; Spark
    does the equivalent widening implicitly)."""
    return (
        f"CAST(CAST(CAST({expr} AS DECIMAL(18,9)) AS DECIMAL(28,9))"
        f" * 1000000000 AS BIGINT)"
    )


def mean_round6_micro(sum_micro9: Column, cnt: Column) -> Column:
    """Exact ``floor(mean·1e6 + 0.5)/1e6`` of nano-unit terms.

    ``sum_micro9`` is an exact integer (BIGINT or DECIMAL(38,0)) sum
    of 1e-9-quantized terms, ``cnt`` the term count.  The mean's
    half-up 6-decimal rounding is computed entirely in integer
    arithmetic::

        floor(mean·1e6 + 1/2) = floor((2·S + 1000·c) / (2000·c))

    with floor-division built from truncated ``%``/``div`` (identical
    sign semantics in Spark and DuckDB, probed) via the standard
    mod-adjust identity — after subtracting the non-negative
    remainder, the quotient is an exact multiple, so truncation IS
    floor.  Only then does the small (≤ ~3.5e7) quotient touch a
    double, where it is exact.  This is not just engine-portable, it
    is the *mathematically exact* half-up rounding of the exact
    rational mean — quantized score sums land exactly on the .5
    boundary often enough that any double-arithmetic formulation
    re-rolls ulp dice per group (measured: 3/5000 docs at sf0.1).

    All intermediates ride DECIMAL(38,0) (Spark) / HUGEINT (DuckDB in
    :func:`sql_mean_round6`), so group-level sums cannot overflow even
    at 100-TB token counts.
    """
    a = sum_micro9.cast("decimal(38,0)") * F.lit(2) + cnt.cast(
        "decimal(38,0)"
    ) * F.lit(1000)
    b = cnt.cast("decimal(38,0)") * F.lit(2000)
    r = ((a % b) + b) % b
    # IntegralDivide ("div") on decimals: exact, returns LONG.
    q = F.call_function("div", a - r, b)
    return q.cast("double") / F.lit(1000000.0)


def sql_mean_round6(sum_micro9: str, cnt: str) -> str:
    """DuckDB twin of :func:`mean_round6_micro` (HUGEINT lane —
    DuckDB's ``/`` on integers returns DOUBLE, so use ``//`` after the
    same mod-adjustment; ``//`` truncates, exact on the adjusted
    multiple)."""
    a = f"(CAST({sum_micro9} AS HUGEINT) * 2 + CAST({cnt} AS HUGEINT) * 1000)"
    b = f"(CAST({cnt} AS HUGEINT) * 2000)"
    r = f"((({a} % {b}) + {b}) % {b})"
    q = f"CAST(({a} - {r}) // {b} AS BIGINT)"
    return f"(CAST({q} AS DOUBLE) / CAST(1000000.0 AS DOUBLE))"


def ln_ratio_portable(num: Column, den: Column) -> Column:
    """Bit-portable ``ln(num/den)`` for positive int64 columns:
    ``ln_int_portable(num) − ln_int_portable(den)`` (the subtraction is
    one more correctly-rounded op, identical in both engines).  Unlike
    ``ln(num/den)`` this never forms the ratio, so arguments only need
    to be exact integers — scale non-integer factors into them
    (0.4·a/b → ``ln_ratio(2a, 5b)``)."""
    return ln_int_portable(num) - ln_int_portable(den)


def sql_ln_ratio(num: str, den: str) -> str:
    """DuckDB twin of :func:`ln_ratio_portable`."""
    return f"({sql_ln_int(num)} - {sql_ln_int(den)})"


# 2^42 and 2^84 — the limb bases for the wide-integer → double split.
_LIMB = 4398046511104  # 2^42, < 2^53: exact as a double
_LIMB2_STR = "19342813113834066795298816"  # 2^84, exact power of two


def dec38_to_double_portable(col: Column) -> Column:
    """Bit-portable ``DECIMAL(38,0) → DOUBLE`` for exact-integer sums
    that may exceed 2^53.

    Spark's decimal→double cast is correctly rounded
    (``BigDecimal.doubleValue``); DuckDB recomposes the int128 through
    double arithmetic and can double-round — the same hazard class
    :func:`quantize_micro9` documents for scaled decimals.  Above 2^53
    the two engines therefore disagree by 1 ulp on a measurable
    fraction of values, which the hash-comparing gate treats as a
    miss.

    The portable route splits the integer into three base-2^42 limbs
    with exact integer div/mod, casts each limb to double exactly
    (every limb < 2^53; the top limb < 1e38/2^84 ≈ 5.2e12), and
    recomposes with power-of-two multiplies (exact) and two
    left-associated adds (correctly rounded, same order in both
    engines).  The result is within 1 ulp of the true value and —
    the property the gate needs — bit-identical across engines by
    construction.  Negative inputs split on ``abs`` and restore the
    sign with an exact negation.
    """
    u = F.abs(col.cast("decimal(38,0)"))
    b2 = F.lit(_LIMB2_STR).cast("decimal(38,0)")
    b1 = F.lit(_LIMB).cast("decimal(38,0)")
    hi = F.call_function("div", u, b2)  # long, exact
    rem = u - hi.cast("decimal(38,0)") * b2
    mid = F.call_function("div", rem, b1)  # long, < 2^42
    lo = (rem - mid.cast("decimal(38,0)") * b1).cast("long")
    mag = (
        hi.cast("double") * F.lit(float(1 << 84))
        + mid.cast("double") * F.lit(float(1 << 42))
        + lo.cast("double")
    )
    return F.when(col < 0, -mag).otherwise(mag)


def sql_dec38_to_double(expr: str) -> str:
    """DuckDB twin of :func:`dec38_to_double_portable` (HUGEINT lane;
    ``//``/``%`` on the non-negative magnitude are exact integer ops,
    and the power-of-two factors are CAST('…' AS DOUBLE) literals per
    the module's bare-literal pitfall)."""
    u = f"abs(CAST({expr} AS HUGEINT))"
    hi = f"({u} // CAST('{_LIMB2_STR}' AS HUGEINT))"
    rem = f"({u} % CAST('{_LIMB2_STR}' AS HUGEINT))"
    mid = f"({rem} // {_LIMB})"
    lo = f"({rem} % {_LIMB})"
    mag = (
        f"(CAST({hi} AS DOUBLE) * CAST('{float(1 << 84)!r}' AS DOUBLE)"
        f" + CAST({mid} AS DOUBLE) * CAST('{float(1 << 42)!r}' AS DOUBLE)"
        f" + CAST({lo} AS DOUBLE))"
    )
    return (
        f"(CASE WHEN {expr} < 0 THEN -{mag} ELSE {mag} END)"
    )
