"""Public-suffix-list registered-domain rollup (eTLD+1).

``web.registered_domain`` is a 7-suffix heuristic; every per-domain cap
and mixture number on a real crawl is only as right as its eTLD+1, so
this module builds the documented seam (``web.py:14-17,70-75``): a
**pinned, deterministic in-repo snapshot** of public-suffix rules and a
broadcast-join rollup implementing the publicsuffix.org algorithm —
longest matching rule wins, wildcard rules (``*.ck``) match exactly one
extra label, exception rules (``!www.ck``) carve a registrable name out
of a wildcard.

Scale posture (100 TB, billions of hosts):

* The rules table is tiny (hundreds of rows pinned here; ~10k for the
  full published list) and is joined with an explicit ``broadcast`` —
  never shuffled.
* The host side computes a FIXED number of candidate suffix columns
  (one per rule label depth, ``K`` = max labels in the rule set) and
  left-broadcast-joins each — **zero shuffles, map-side only**, no
  explode/regroup of the corpus. Plan width grows with K (the PSL's
  deepest rules are ~5 labels), not with corpus size.
* Swapping in the full published list is a data change, not a code
  change: pass ``rules=`` with the full rule text list (one rule per
  entry, PSL syntax) and the same plan compiles.

Snapshot provenance: the rules live in ``psl_snapshot.dat`` next to
this module — publicsuffix.org list FORMAT, written from public
knowledge of the published list (ICANN ccTLD second-level registries,
the wildcard/exception geo families, IDN registry rules, and the
high-traffic private-division operators). Refreshing it is a DATA
change: replace the file with the verbatim published list and the same
plan compiles (width grows only with the deepest rule's label count).
Single-label rules are intentionally absent — the PSL default rule
``*`` (any TLD is a public suffix) covers them, so an unmatched host
resolves to its last two labels, exactly like the published algorithm.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SNAPSHOT_PATH = os.path.join(os.path.dirname(__file__), "psl_snapshot.dat")


def load_snapshot_rules(path: str = _SNAPSHOT_PATH) -> tuple[str, ...]:
    """Read a publicsuffix.org-format rule file (``//`` comments and
    blank lines ignored) into the rule tuple :func:`parse_rules`
    consumes. The in-repo ``psl_snapshot.dat`` is the pinned default;
    production points this at the verbatim published list."""
    with open(path, encoding="utf-8") as fh:
        rules = tuple(
            ln.strip()
            for ln in fh
            if ln.strip() and not ln.strip().startswith("//")
        )
    if not rules:
        raise ValueError(f"empty public-suffix rule file: {path!r}")
    return rules


#: pinned public-suffix snapshot (PSL syntax: ``!`` = exception rule,
#: ``*`` = wildcard label), loaded from ``psl_snapshot.dat``.
#: Multi-label rules only — the implicit PSL default rule ``*`` covers
#: every bare TLD.
PSL_SNAPSHOT_RULES: tuple[str, ...] = load_snapshot_rules()


def parse_rules(
    rules: tuple[str, ...] | list[str] | None = None,
) -> list[tuple[str, int, bool, bool]]:
    """Parse PSL-syntax rule strings into ``(match_text, n_labels,
    is_wildcard, is_exception)`` rows.

    ``match_text`` is the join key: the literal rule for exact and
    wildcard rows (wildcards keep their ``*.`` prefix — the host side
    synthesizes the same form), the rule **without** ``!`` for
    exception rows. ``n_labels`` counts the ``*`` as a label (it
    consumes one host label when matching).
    """
    out = []
    for raw in rules if rules is not None else PSL_SNAPSHOT_RULES:
        r = raw.strip().lower()
        if not r or r.startswith("//"):
            continue
        is_exc = r.startswith("!")
        text = r[1:] if is_exc else r
        is_wild = text.startswith("*.")
        n = text.count(".") + 1
        if is_exc and is_wild:
            raise ValueError(f"rule cannot be both exception and wildcard: {raw!r}")
        out.append((text, n, is_wild, is_exc))
    if not out:
        raise ValueError("empty public-suffix rule set")
    # duplicate match texts would fan rows out through the left joins
    # (row multiplication, silently corrupting every downstream count)
    seen: set[str] = set()
    for text, _, _, _ in out:
        if text in seen:
            raise ValueError(f"duplicate public-suffix rule: {text!r}")
        seen.add(text)
    return out


def registered_domain_psl(
    df: DataFrame,
    host_col: str = "host",
    out_col: str = "domain",
    rules: tuple[str, ...] | list[str] | None = None,
) -> DataFrame:
    """Attach ``out_col`` = registered domain (eTLD+1) of ``host_col``
    under the public-suffix-list algorithm, using the pinned
    :data:`PSL_SNAPSHOT_RULES` (or a caller-supplied full list).

    Algorithm (publicsuffix.org): among all rules whose labels suffix
    the host's labels (``*`` matching exactly one label), an exception
    rule prevails outright (its public suffix drops the leftmost
    label); otherwise the rule with the most labels prevails; otherwise
    the default rule ``*`` applies (the TLD is the public suffix). The
    registered domain is the public suffix plus one host label. A host
    that IS a public suffix maps to itself (closure convention shared
    with the heuristic: a bare TLD has no registrable part, and keeping
    the host keeps every downstream cap/mixture total defined). NULL
    host → NULL domain.

    Plan shape: per rule depth ``k`` (2..K), two left **broadcast**
    joins — exact/exception rows keyed on the host's last-``k``-labels
    suffix, wildcard rows keyed on ``'*.' || last-(k-1)-labels`` — then
    one CASE picks the prevailing depth. Map-side only, zero shuffles,
    host strings never move.
    """
    parsed = parse_rules(rules)
    k_max = max(n for _, n, _, _ in parsed)
    spark = df.sparkSession
    from dataproc_spark.core import ensure_no_columns

    tmp = [c for c in df.columns if c.lower().startswith("_psl_")]
    ensure_no_columns(df, tmp + [out_col], "registered_domain_psl")
    from dataproc_spark.core import local_frame

    rules_df = local_frame(
        spark, parsed, "rule string, n int, is_wild boolean, is_exc boolean"
    )

    h = F.lower(F.col(host_col))
    n_labels = F.size(F.split(h, r"\.", -1))
    out = df.withColumn("_psl_n", n_labels)
    exc_flags: list[tuple[int, Column]] = []
    std_flags: list[tuple[int, Column]] = []
    for k in range(2, k_max + 1):
        s_k = F.when(F.col("_psl_n") >= k, F.substring_index(h, ".", -k))
        w_k = F.when(
            F.col("_psl_n") >= k,
            F.concat(F.lit("*."), F.substring_index(h, ".", -(k - 1))),
        )
        ex = (
            rules_df.where((F.col("n") == k) & ~F.col("is_wild"))
            .select(
                F.col("rule").alias(f"_psl_r{k}"),
                F.col("is_exc").alias(f"_psl_e{k}"),
            )
        )
        wi = (
            rules_df.where((F.col("n") == k) & F.col("is_wild"))
            .select(
                F.col("rule").alias(f"_psl_w{k}"),
                F.lit(True).alias(f"_psl_wm{k}"),
            )
        )
        out = (
            out.withColumn(f"_psl_s{k}", s_k)
            .join(F.broadcast(ex), F.col(f"_psl_s{k}") == F.col(f"_psl_r{k}"), "left")
            .withColumn(f"_psl_c{k}", w_k)
            .join(F.broadcast(wi), F.col(f"_psl_c{k}") == F.col(f"_psl_w{k}"), "left")
        )
        exc_flags.append((k, F.col(f"_psl_e{k}") == F.lit(True)))
        std_flags.append(
            (
                k,
                (F.col(f"_psl_e{k}") == F.lit(False))
                | (F.col(f"_psl_wm{k}") == F.lit(True)),
            )
        )
    # prevailing rule: exception first (deepest, though the PSL never
    # carries two matching exceptions), then deepest exact/wildcard,
    # else the default rule '*' (ps_len 1)
    cases = None
    for k, flag in sorted(exc_flags, reverse=True):
        cases = (cases.when(flag, k - 1) if cases is not None
                 else F.when(flag, F.lit(k - 1)))
    for k, flag in sorted(std_flags, reverse=True):
        cases = cases.when(flag, k) if cases is not None else F.when(flag, F.lit(k))
    ps_len = cases.otherwise(F.lit(1)) if cases is not None else F.lit(1)
    # registered domain = last min(n, ps_len + 1) labels of the host
    m = F.least(F.col("_psl_n"), ps_len + 1)
    dom = reduce(
        lambda acc, i: acc.when(m == i, F.substring_index(h, ".", -i)),
        range(2, k_max + 2),
        F.when(m == 1, F.substring_index(h, ".", -1)),
    ).otherwise(F.lit(None))
    out = out.withColumn(out_col, dom)
    drop = ["_psl_n"] + [
        c for c in out.columns if c.startswith("_psl_") and c != "_psl_n"
    ]
    return out.drop(*drop)
