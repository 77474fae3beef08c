"""Training-data curation operators: decontamination, context-window
chunking, dataset splits, repetition audits, blocklist filtering.

North-star extensions (not in the reference, whose storage layer never
inspects text — src/scalar_storage.cc:20-32): the standard curation
passes an LLM pre-training pipeline runs over a raw corpus before
tokenization.  All are pure DataFrame expressions + one aggregation
shuffle; nothing touches the driver.

Scale notes: every operator here is a linear scan with map-side
partial aggregation except decontamination, whose benchmark side is
tiny by construction (a held-out eval set) and therefore broadcast —
the corpus is never shuffled, only scanned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens, word_shingles
from ..sources.loaders import fan_out

TRAIN_PCT, VAL_PCT = 90, 95  # md5(doc_id) % 100 cutpoints


def decontaminate(
    docs: DataFrame, bench_mod: int = 100, plant_shift: int = 1_000_000, n: int = 8
) -> DataFrame:
    """Benchmark decontamination: find training documents sharing any
    n-token shingle with the held-out benchmark set (here: the planted
    originals, doc_id % bench_mod == 0 below plant_shift — their
    planted copies are guaranteed contaminated, so the check has
    positive signal at every sf).

    Plan shape: the benchmark is small → its distinct shingle set
    BROADCASTS; the corpus streams once through the hash join, then
    one shuffle by doc_id for the per-doc rollup.  At 100 TB the
    benchmark (an eval suite) is still MBs — this is the canonical
    broadcast-semi-join decontamination pass."""
    is_bench = (F.col("doc_id") % bench_mod == 0) & (F.col("doc_id") < plant_shift)
    sh = F.explode(word_shingles(tokens(F.col("text")), n)).alias("sh")

    bench_sh = (
        docs.filter(is_bench)
        .select(F.col("doc_id").alias("bench_id"), sh)
        .distinct()
    )
    # No .distinct() on the corpus side: that would shuffle every
    # exploded (doc_id, shingle) pair.  Duplicate shingles survive the
    # broadcast probe but countDistinct in the rollup dedups them, and
    # only MATCHING rows (benchmark collisions, tiny) are shuffled.
    train_sh = fan_out(docs.filter(~is_bench)).select("doc_id", sh)
    return (
        train_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("bench_id").cast("bigint").alias("n_bench_hit"),
            F.countDistinct("sh").cast("bigint").alias("n_shared_shingles"),
        )
    )


def chunk_audit(docs: DataFrame, size: int = 128, stride: int = 96) -> DataFrame:
    """Context-window chunking accounting: split each doc's token
    stream into windows of `size` every `stride` tokens (overlap =
    size - stride) and report per-source chunk counts and padding
    waste.  The chunk starts are a sequence() expression expanded
    in-scan — the explode factor is ~n_tokens/stride, all before the
    single aggregation shuffle."""
    toks = tokens(F.col("text"))
    sz = F.size(toks)
    starts = F.explode(
        F.sequence(F.lit(1), F.greatest(sz, F.lit(1)), F.lit(stride))
    ).alias("start")
    chunks = (
        fan_out(docs.select("source", "text"))
        .select("source", sz.alias("n_tok"), starts)
        .filter(F.col("n_tok") >= 1)
        .select(
            "source",
            F.least(F.lit(size), F.col("n_tok") - F.col("start") + 1).alias("chunk_tok"),
        )
    )
    return chunks.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_chunks"),
        F.sum("chunk_tok").cast("bigint").alias("sum_chunk_tokens"),
        F.count(F.when(F.col("chunk_tok") < size, 1)).cast("bigint").alias("n_partial"),
    )


def split_audit(docs: DataFrame) -> DataFrame:
    """Deterministic train/val/test assignment: md5(doc_id) % 100 →
    <90 train, <95 val, else test (the same hash-gate convention as
    the stratified sampler, reproducible at any partitioning and
    engine).  Per (split, lang): doc count and character volume —
    the dataset-card numbers."""
    from ..functions.text import md5_int

    gate = md5_int(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(gate < TRAIN_PCT, "train")
        .when(gate < VAL_PCT, "val")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


def repetition_stats(docs: DataFrame, n: int = 3) -> DataFrame:
    """Within-document repetition audit (the Gopher/C4 quality rule):
    per source, how many docs repeat an n-gram internally, plus the
    corpus-level repeated-shingle mass.  All counts are exact ints;
    the single ratio is one f64 division at the end."""
    sh = word_shingles(tokens(F.col("text")), n)
    per_doc = fan_out(docs.select("source", "text")).select(
        "source",
        F.size(sh).alias("n_sh"),
        F.size(F.array_distinct(sh)).alias("n_uniq"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.count(F.when(F.col("n_uniq") < F.col("n_sh"), 1))
        .cast("bigint")
        .alias("n_docs_with_repeats"),
        F.sum("n_sh").cast("bigint").alias("sum_shingles"),
        F.sum("n_uniq").cast("bigint").alias("sum_distinct"),
        F.round(
            F.lit(1.0) - F.sum("n_uniq").cast("double") / F.sum("n_sh"), 6
        ).alias("corpus_rep_ratio"),
    )


def blocklist_audit(docs: DataFrame, words: list[str]) -> DataFrame:
    """Blocklist filtering audit (C4-style bad-word pass): per source,
    docs containing any blocklisted token and the total occurrence
    count.  arrays_overlap/array_intersect run in-scan; zero shuffles
    before the final per-source rollup."""
    toks = tokens(F.col("text"))
    bl = F.lit(words).cast("array<string>")
    hits = F.size(F.filter(toks, lambda t: F.array_contains(bl, t)))
    return (
        fan_out(docs.select("source", "text"))
        .select("source", hits.alias("n_hits"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count(F.when(F.col("n_hits") > 0, 1)).cast("bigint").alias("n_flagged"),
            F.sum("n_hits").cast("bigint").alias("total_hits"),
        )
    )


# PII patterns: character-class-only regexes that parse identically in
# Java (Spark) and RE2 (DuckDB oracle) — no \b, no lookaround.
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PII_PHONE = "[0-9]{3}-[0-9]{4}-[0-9]{4}"
PII_IPV4 = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"


def inject_pii(docs: DataFrame) -> DataFrame:
    """Fixture augmentation: the synthetic corpus carries no PII, so a
    deterministic doc_id-keyed subset gets an email / phone / IPv4
    appended (the SAME expression runs in the DuckDB oracle).  The
    redaction operator below is the general-purpose piece; this just
    gives it ground truth to find."""
    sid = F.col("doc_id").cast("string")
    aug = (
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" contact user"), sid, F.lit("@example.com now")),
        )
        .when(
            F.col("doc_id") % 7 == 1,
            F.concat(F.col("text"), F.lit(" call 555-"),
                     F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                     F.lit("-1234")),
        )
        .when(
            F.col("doc_id") % 7 == 2,
            F.concat(F.col("text"), F.lit(" from 10.0."),
                     (F.col("doc_id") % 256).cast("string"), F.lit("."),
                     (F.col("doc_id") % 100).cast("string")),
        )
        .otherwise(F.col("text"))
    )
    return docs.withColumn("text", aug)


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction: emails -> <EMAIL>, phones -> <PHONE>, IPv4 ->
    <IP>, applied as chained JVM regexp_replace (no Python in the hot
    path; at 100 TB this is a pure map stage, no shuffle).  Adds match
    counts per type so the audit can aggregate without re-scanning."""
    t = F.col(text_col)
    return docs.withColumn(
        "n_emails", F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), F.lit(0))).cast("bigint")
    ).withColumn(
        "n_phones", F.size(F.regexp_extract_all(t, F.lit(PII_PHONE), F.lit(0))).cast("bigint")
    ).withColumn(
        "n_ips", F.size(F.regexp_extract_all(t, F.lit(PII_IPV4), F.lit(0))).cast("bigint")
    ).withColumn(
        "redacted",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(t, PII_EMAIL, "<EMAIL>"), PII_PHONE, "<PHONE>"
            ),
            PII_IPV4,
            "<IP>",
        ),
    )


def pii_audit(docs: DataFrame) -> DataFrame:
    """Per-source PII accounting over the redacted corpus: doc and
    match counts plus net chars removed (negative if placeholders are
    longer than the match).  One scan, one small shuffle on source."""
    red = redact_pii(inject_pii(docs))
    pii = F.col("n_emails") + F.col("n_phones") + F.col("n_ips")
    return (
        red.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum((pii > 0).cast("int")).cast("bigint").alias("n_docs_with_pii"),
            F.sum("n_emails").cast("bigint").alias("n_emails"),
            F.sum("n_phones").cast("bigint").alias("n_phones"),
            F.sum("n_ips").cast("bigint").alias("n_ips"),
            F.sum(F.length("text") - F.length("redacted")).cast("bigint").alias("chars_removed"),
        )
    )


def mixture_sample_audit(docs: DataFrame, weights: dict[str, int] | None = None,
                         default_permille: int = 500) -> DataFrame:
    """Training-mixture downsampling: each source keeps rows whose
    md5(doc_id) gate (0..999) falls under the source's target
    permille — deterministic, reproducible, no shuffle for the gate
    itself (the only shuffle is the per-source audit agg).  At 100 TB
    this IS the mixture sampler: a pure filter at full scan speed."""
    if weights is None:
        # upweight even sources, thin odd ones — a recognizable mixture
        weights = {f"src{i}": (800 if i % 2 == 0 else 200) for i in range(20)}
    gate = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 1000
    )
    w = F.coalesce(
        *[F.when(F.col("source") == s, F.lit(p)) for s, p in sorted(weights.items())],
        F.lit(default_permille),
    )
    kept = docs.withColumn("_g", gate).withColumn("_w", w)
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum((F.col("_g") < F.col("_w")).cast("int")).cast("bigint").alias("n_kept"),
            F.max("_w").cast("int").alias("target_permille"),
        )
        .withColumn(
            "achieved_permille",
            F.round(F.col("n_kept") * F.lit(1000.0) / F.col("n_docs"), 6),
        )
    )


def decontaminate_fuzzy(
    docs_plus: DataFrame,
    bench_mod: int = 100,
    plant_shift: int = 1_000_000,
    min_est: float = 0.5,
) -> DataFrame:
    """FUZZY benchmark decontamination: the MinHash sibling of the exact
    8-gram pass above — catches paraphrased/lightly-edited benchmark
    leakage that exact shingle matching misses (the decontamination
    gap documented for real pre-training corpora).

    Benchmark docs (the planted originals) and training docs both get
    8-hash MinHash signatures; candidates are generated per LSH band
    (2 rows x 4 bands), with the BENCHMARK band table broadcast — an
    eval suite is MBs even at 100 TB corpus scale, so the corpus is
    scanned once and never shuffled for candidate generation.  Each
    candidate pair's Jaccard is then ESTIMATED from signature
    agreement (matching hash slots / 8) and thresholded.  All integer
    hashing — deterministic, oracle-replayable.
    """
    from ..functions.text import MINHASH_A, md5_int, minhash_from_hashes

    is_bench = (F.col("doc_id") % bench_mod == 0) & (F.col("doc_id") < plant_shift)
    hashed = (
        fan_out(docs_plus)
        .filter(F.size(tokens(F.col("text"))) >= 3)
        .select(
            "doc_id",
            is_bench.alias("__bench"),
            F.transform(word_shingles(tokens(F.col("text"))), md5_int).alias("_h"),
        )
    )
    sigs = hashed.select(
        "doc_id", "__bench", *minhash_from_hashes(F.col("_h"))
    ).localCheckpoint()
    n_h = len(MINHASH_A)
    mh = [f"mh{i}" for i in range(n_h)]
    bands = lambda df, idc: df.select(
        F.col("doc_id").alias(idc),
        *[F.col(c).alias(f"{idc}_{c}") for c in mh],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "_", F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}")
                        ).alias("bucket"),
                    )
                    for b in range(n_h // 2)
                ]
            )
        ).alias("bb"),
    ).select(idc, *[f"{idc}_{c}" for c in mh], "bb.band", "bb.bucket")

    bench = bands(sigs.filter(F.col("__bench")), "bench_id")
    train = bands(sigs.filter(~F.col("__bench")), "doc_id")
    agree = sum(
        (F.col(f"doc_id_{c}") == F.col(f"bench_id_{c}")).cast("int") for c in mh
    )
    return (
        train.join(F.broadcast(bench), ["band", "bucket"])
        .select("doc_id", "bench_id", *[f"doc_id_{c}" for c in mh],
                *[f"bench_id_{c}" for c in mh])
        .distinct()
        .select(
            "doc_id",
            "bench_id",
            F.round(agree / F.lit(float(len(mh))), 6).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= min_est)
    )


def split_leakage_audit(cluster_labels: DataFrame) -> DataFrame:
    """Dedup-aware split hygiene: a near-dup cluster whose members land
    in DIFFERENT train/val/test splits leaks training text into
    evaluation — the contamination mode that survives naive
    per-document hash splitting (copies hash differently).  Input is
    the connected-components label table; each member gets the same
    md5 split gate as split_audit, then clusters are scored by how
    many distinct splits they span.

    One row out: cluster count, leaky-cluster count, documents at
    risk, leak rate.  Two tiny aggregates over the label table (the
    cluster graph, not the corpus) — the fix at scale is to split by
    CLUSTER id instead of doc id, which this audit is the case for."""
    from ..functions.text import md5_int

    gate = md5_int(F.col("node").cast("string")) % 100
    split = (
        F.when(gate < TRAIN_PCT, "train")
        .when(gate < VAL_PCT, "val")
        .otherwise("test")
    )
    per = (
        cluster_labels.select("cluster", split.alias("split"))
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n_members"),
            F.countDistinct("split").alias("n_splits"),
        )
    )
    leaky = (F.col("n_splits") > 1).cast("long")
    return per.agg(
        F.count("*").cast("bigint").alias("n_clusters"),
        F.sum(leaky).cast("bigint").alias("n_leaky"),
        F.sum(F.col("n_members") * leaky).cast("bigint").alias("n_docs_at_risk"),
        F.round(F.sum(leaky) / F.count("*").cast("double"), 6).alias("leak_rate"),
    )


def mixture_temperature(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Temperature-scaled source-mixture weights (tau = 0.5, i.e.
    w_s ∝ sqrt(tokens_s)): the standard flattening that upweights
    small high-quality sources relative to proportional sampling.
    Reports, per source, the natural token share, the temperature
    share, and the resulting boost factor.

    Determinism: token counts are exact ints; sqrt is IEEE
    correctly-rounded; the two share divisions are rounded to 6 after
    a <=|sources|-term double sum (error ~1e-15 at these magnitudes).
    Scale: one tokenize+agg pass (shuffle on source), then
    |sources|-row arithmetic on a broadcast total."""
    per = docs.groupBy("source").agg(
        F.sum(F.size(tokens(F.col(text_col)))).cast("long").alias("n_tokens")
    )
    tot = per.agg(
        F.sum("n_tokens").cast("double").alias("_tt"),
        F.sum(F.sqrt(F.col("n_tokens").cast("double"))).alias("_ts"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.round(F.col("n_tokens").cast("double") / F.col("_tt"), 6).alias("nat_share"),
        F.round(F.sqrt(F.col("n_tokens").cast("double")) / F.col("_ts"), 6).alias(
            "temp_share"
        ),
        F.round(
            (F.sqrt(F.col("n_tokens").cast("double")) / F.col("_ts"))
            / (F.col("n_tokens").cast("double") / F.col("_tt")),
            6,
        ).alias("boost"),
    )


ARES_K = 20


def weighted_sample_ares(
    docs: DataFrame, k: int = ARES_K, weight_col: str = "n_chars"
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-Res): key_i = -ln(u_i) / w_i with u_i a
    fixed md5-derived uniform in (0,1); the k SMALLEST keys are the
    sample — heavier docs win proportionally, reproducible across
    runs/engines because the 'randomness' is the content-stable hash.
    The per-epoch weighted-mixture sampler in deterministic form.

    Scale: key is a map-side expression; selection is a
    TakeOrderedAndProject per-partition heap — no shuffle of the
    corpus, exactly the hash_sample contract but weight-aware."""
    from ..functions.text import md5_int

    u = (md5_int(F.col("doc_id").cast("string")) + 1).cast("double") / F.lit(
        4294967297.0
    )  # strictly inside (0,1): md5_int is in [0, 2^32)
    key = F.round(-F.log(u) / F.col(weight_col).cast("double"), 10)
    return (
        docs.select(
            "doc_id",
            F.col(weight_col).cast("long").alias("weight"),
            key.alias("ares_key"),
        )
        .orderBy(F.col("ares_key").asc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "weight", F.round("ares_key", 6).alias("ares_key"))
    )


LUHN_DIGITS = 16


def luhn_card_audit(orders: DataFrame) -> DataFrame:
    """Luhn-checksum PII detector: the validation gate a credit-card
    scrubber runs on every 13-19-digit span before redacting (a bare
    \\d{16} regex false-positives on ids and timestamps; the checksum
    is what separates card-shaped noise from likely-real PAN data).

    The fixture corpus has no digit spans, so candidates are
    synthesized deterministically from the order keys (16-digit
    strings) — the point under test is the checksum expression, which
    is pure JVM arithmetic: reverse the digits, double every second
    one, subtract 9 when the double exceeds 9, valid iff the sum is
    divisible by 10.  Output: per order-priority candidate counts and
    how many pass Luhn (~10% of uniform strings, the detector's
    background false-positive rate).

    Scale: one scan, no shuffle before the 5-group aggregate; the
    checksum is a fixed-size expression inside whole-stage codegen."""
    cand = F.substring(
        F.concat(
            F.lpad(F.col("o_orderkey").cast("string"), 8, "0"),
            F.lpad(F.col("o_custkey").cast("string"), 8, "0"),
        ),
        1,
        LUHN_DIGITS,
    )
    rev = F.reverse(cand)
    def term(i: int):  # positional Luhn term, 1-based from the right
        d = F.substring(rev, i, 1).cast("int")
        if i % 2 == 0:
            return F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
        return d

    total = None
    for i in range(1, LUHN_DIGITS + 1):
        t = term(i)
        total = t if total is None else total + t
    return (
        orders.select("o_orderpriority", (total % 10 == 0).alias("_ok"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_candidates"),
            F.sum(F.col("_ok").cast("int")).cast("long").alias("n_luhn_valid"),
            F.round(
                F.sum(F.col("_ok").cast("int")) / F.count("*").cast("double"), 6
            ).alias("valid_rate"),
        )
    )


K_ANON_QI = ("c_nationkey", "c_mktsegment")
K_ANON_K = 5


def k_anonymity_audit(
    customer: DataFrame,
    qi: tuple[str, ...] = K_ANON_QI,
    k: int = K_ANON_K,
    sensitive: str = "c_custkey",
) -> DataFrame:
    """k-anonymity / l-diversity audit over a quasi-identifier set —
    the anonymization gate before a data release: group sizes under
    the QI columns (every group must reach k), plus the minimum
    distinct-sensitive-value count (l-diversity floor).

    Output is one summary row: equivalence-class count, the smallest
    class, how many rows sit in classes below k (re-identification
    exposure), and min l.  Scale: one QI-keyed aggregate, then a
    summary over the (bounded) class table."""
    classes = customer.groupBy(*qi).agg(
        F.count("*").alias("cls_n"),
        F.countDistinct(sensitive).alias("cls_l"),
    )
    return classes.agg(
        F.count("*").cast("long").alias("n_classes"),
        F.min("cls_n").cast("long").alias("min_class_size"),
        F.sum(F.when(F.col("cls_n") < k, F.col("cls_n")).otherwise(0))
        .cast("long")
        .alias("rows_below_k"),
        F.min("cls_l").cast("long").alias("min_l_diversity"),
        (F.min("cls_n") >= k).alias("k_anonymous"),
    )


MIX_BUDGET_X = 2.0  # token budget = 2x the natural corpus
MIX_MAX_EPOCHS = 4.0  # repetition cap per source


def mixture_epoch_solver(
    docs: DataFrame,
    budget_x: float = MIX_BUDGET_X,
    max_epochs: float = MIX_MAX_EPOCHS,
    text_col: str = "text",
) -> DataFrame:
    """Mixture -> epoch plan: given a token budget (``budget_x`` times
    the natural corpus) and tau=0.5 temperature weights, solve each
    source's target tokens and repetition factor (epochs), clipping at
    ``max_epochs`` — the repetition planner that turns mixture weights
    into an actual sampling schedule, reporting how many target tokens
    the cap forfeits per source.

    Determinism: exact int token counts; weights and ratios f64 over
    |sources| terms, ROUND 6.  Same one-pass shape as
    mixture_temperature."""
    from ..functions.text import tokens

    per = docs.groupBy("source").agg(
        F.sum(F.size(tokens(F.col(text_col)))).cast("long").alias("n_tokens")
    )
    tot = per.agg(
        F.sum("n_tokens").cast("double").alias("_tt"),
        F.sum(F.sqrt(F.col("n_tokens").cast("double"))).alias("_ts"),
    )
    w = F.sqrt(F.col("n_tokens").cast("double")) / F.col("_ts")
    target = w * F.col("_tt") * F.lit(budget_x)
    epochs = target / F.col("n_tokens").cast("double")
    capped = F.least(epochs, F.lit(max_epochs))
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.round(w, 6).alias("weight"),
        F.round(target, 2).alias("target_tokens"),
        F.round(epochs, 6).alias("epochs_uncapped"),
        F.round(capped, 6).alias("epochs"),
        F.round(
            F.greatest(target - F.lit(max_epochs) * F.col("n_tokens"),
                       F.lit(0.0)),
            2,
        ).alias("forfeited_tokens"),
    )


DP_EPSILON = 1.0  # privacy budget for the noisy-count release audit


def dp_noisy_counts(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    eps: float = DP_EPSILON,
) -> DataFrame:
    """Differential-privacy RELEASE AUDIT: per-nation order counts with
    Laplace(sensitivity/eps) noise, next to the true counts and the
    absolute utility loss — the epsilon-vs-utility table a data
    steward signs off before publishing aggregates of a 100 TB corpus
    (count queries have sensitivity 1: one customer's order moves one
    cell by one).

    Determinism: the Laplace draw uses inverse-CDF over an md5-seeded
    uniform of the group key (the same content-stable PRNG as the
    bootstrap/split gates) — auditable and oracle-checkable; a
    production release would swap ONLY the uniform for a secure RNG.
    ln goes through ROUND(...,9) so a 1-ulp library difference cannot
    move a published cell.

    Plan: dims broadcast onto the fact scan, one groupBy(nation);
    noise is per-group arithmetic on the 25-row aggregate."""
    j = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_true"))
    )
    from ..functions.text import md5_int

    u = md5_int(F.col("nation")) / F.lit(4294967296.0) - F.lit(0.5)
    noise = (
        F.lit(-1.0 / eps)
        * F.when(u < 0, -1.0).otherwise(1.0)
        * F.round(F.log(F.greatest(1 - 2 * F.abs(u), F.lit(1e-9))), 9)
    )
    return j.select(
        "nation",
        F.col("n_true").cast("long"),
        F.round(F.col("n_true") + noise, 6).alias("n_noisy"),
        F.round(F.abs(noise), 6).alias("abs_err"),
        F.lit(float(eps)).alias("epsilon"),
    )


# -- Neyman allocation -------------------------------------------------------

NEYMAN_BUDGET = 1000  # total sample size to allocate


def neyman_allocation(docs: DataFrame, budget: int = NEYMAN_BUDGET) -> DataFrame:
    """NEYMAN OPTIMAL ALLOCATION for a stratified sample of documents
    (strata = source, target = mean n_chars): n_h proportional to
    N_h * s_h beats proportional allocation whenever strata differ in
    spread — the survey-sampling answer to 'how many docs should each
    source contribute to the eval sample'.  Reports both allocations
    per stratum and, on the source='__total__' row, the stratified-
    mean variances under each plus the efficiency ratio.

    Determinism: per-stratum power sums are exact; sd/weights are
    fixed f64 expressions; the two cross-stratum sums (the N_h*s_h
    normalizer and the variance totals) sum ROUND-9/ROUND-4 DECIMAL
    terms, so 20-way addition order cannot flip a digit.  Allocations
    FLOOR (never round) with a 1-doc floor per stratum.

    Scale: one source-keyed aggregate; everything downstream is
    |sources|-sized."""
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("decimal(38,0)").alias("_sx"),
        F.sum(F.col("n_chars") * F.col("n_chars"))
        .cast("decimal(38,0)")
        .alias("_sxx"),
    )
    nd = F.col("n_docs").cast("double")
    sxd = F.col("_sx").cast("double")
    sxxd = F.col("_sxx").cast("double")
    # singleton stratum: (n-1)=0 would raise ANSI DIVIDE_BY_ZERO —
    # no within-stratum variance estimate, so sd falls back to 0 and
    # the stratum gets the 1-doc allocation floor (NULLIF mirrored in
    # the oracle SQL)
    sd = F.sqrt(
        F.greatest(
            F.coalesce(
                F.try_divide(
                    sxxd - sxd * sxd / nd, F.nullif(nd - F.lit(1.0), F.lit(0.0))
                ),
                F.lit(0.0),
            ),
            F.lit(0.0),
        )
    )
    scored = per.select(
        "source",
        "n_docs",
        F.round(sd, 6).alias("sd_chars"),
        F.round(nd * sd, 4).cast("decimal(28,4)").alias("_term"),
    ).localCheckpoint()
    tot = F.broadcast(
        scored.agg(
            F.sum("_term").alias("_D"),
            F.sum("n_docs").cast("long").alias("_N"),
        )
    )
    alloc = scored.crossJoin(tot).select(
        "source",
        "n_docs",
        "sd_chars",
        F.greatest(
            F.lit(1).cast("long"),
            F.floor(
                F.coalesce(
                    F.try_divide(
                        F.lit(float(budget)) * F.col("_term").cast("double"),
                        F.nullif(F.col("_D").cast("double"), F.lit(0.0)),
                    ),
                    F.lit(0.0),
                )
            ).cast("long"),
        ).alias("alloc_neyman"),
        F.greatest(
            F.lit(1).cast("long"),
            F.floor(
                F.lit(float(budget))
                * F.col("n_docs").cast("double")
                / F.col("_N").cast("double")
            ).cast("long"),
        ).alias("alloc_prop"),
        (F.col("n_docs").cast("double") / F.col("_N").cast("double")).alias("_w"),
    ).localCheckpoint()
    vterm = lambda a: F.round(  # noqa: E731
        F.col("_w")
        * F.col("_w")
        * F.col("sd_chars")
        * F.col("sd_chars")
        / F.col(a).cast("double"),
        9,
    ).cast("decimal(28,9)")
    totals = alloc.agg(
        F.lit("__total__").alias("source"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.lit(None).cast("double").alias("sd_chars"),
        F.sum("alloc_neyman").cast("long").alias("alloc_neyman"),
        F.sum("alloc_prop").cast("long").alias("alloc_prop"),
        F.sum(vterm("alloc_prop")).alias("_vp"),
        F.sum(vterm("alloc_neyman")).alias("_vn"),
    ).select(
        "source",
        "n_docs",
        "sd_chars",
        "alloc_neyman",
        "alloc_prop",
        F.round(F.col("_vp").cast("double"), 6).alias("var_prop"),
        F.round(F.col("_vn").cast("double"), 6).alias("var_neyman"),
        F.round(
            F.try_divide(
                F.col("_vp").cast("double"),
                F.nullif(F.col("_vn").cast("double"), F.lit(0.0)),
            ),
            6,
        ).alias("efficiency"),
    )
    pers = alloc.select(
        "source",
        "n_docs",
        "sd_chars",
        "alloc_neyman",
        "alloc_prop",
        F.lit(None).cast("double").alias("var_prop"),
        F.lit(None).cast("double").alias("var_neyman"),
        F.lit(None).cast("double").alias("efficiency"),
    )
    return pers.unionByName(totals)


MASK_DENSITY_GATE = 644245094  # floor(0.15 * 2^32): ~15% of tokens masked


def span_masking_audit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """T5-STYLE SPAN-CORRUPTION masking plan, audited per source: a
    deterministic md5 gate marks ~15% of token positions as noise,
    adjacent masked positions fuse into spans (one sentinel each), and
    the audit reports the numbers a pretraining run budgets around —
    realized mask rate, span count, mean span length, sentinel share
    of the output sequence.  Content-keyed determinism (md5 of
    doc_id:pos) means the same corpus always yields the same plan —
    reproducible data pipelines, no RNG state to ship.

    Plan: one posexplode pass; the span fuse is a doc-partitioned
    gaps-and-islands window (pos - row_number among masked — never a
    global window); per-source aggregate closes it out."""
    from ..functions.text import md5_int, tokens

    toks = docs.select(
        "doc_id",
        "source",
        F.posexplode(tokens(F.col(text_col))).alias("pos", "w"),
    ).withColumn(
        "masked",
        (
            md5_int(
                F.concat_ws(":", F.col("doc_id").cast("string"),
                            F.col("pos").cast("string"))
            )
            < F.lit(MASK_DENSITY_GATE)
        ).cast("int"),
    ).localCheckpoint()
    mw = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        toks.filter(F.col("masked") == 1)
        .withColumn("island", F.col("pos") - F.row_number().over(mw))
        .groupBy("doc_id", "island")
        .agg(
            F.count(F.lit(1)).cast("long").alias("span_len"),
            F.first("source").alias("source"),
        )
    )
    per_doc = toks.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_toks"),
        F.sum("masked").cast("long").alias("n_masked"),
    )
    src_tok = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
        F.sum("n_masked").cast("long").alias("masked_tokens"),
    )
    src_span = spans.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
    )
    out = src_tok.join(src_span, "source", "left").select(
        "source",
        "n_docs",
        "n_tokens",
        "masked_tokens",
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
    )
    rate = F.try_divide(
        F.col("masked_tokens").cast("double"),
        F.nullif(F.col("n_tokens").cast("double"), F.lit(0.0)),
    )
    mean_span = F.try_divide(
        F.col("masked_tokens").cast("double"),
        F.nullif(F.col("n_spans").cast("double"), F.lit(0.0)),
    )
    # output seq = kept tokens + one sentinel per span
    sentinel_share = F.try_divide(
        F.col("n_spans").cast("double"),
        F.nullif(
            (F.col("n_tokens") - F.col("masked_tokens") + F.col("n_spans"))
            .cast("double"),
            F.lit(0.0),
        ),
    )
    return out.select(
        "source",
        "n_docs",
        "n_tokens",
        "masked_tokens",
        "n_spans",
        (F.round(rate, 6) + F.lit(0.0)).alias("mask_rate"),
        (F.round(mean_span, 6) + F.lit(0.0)).alias("mean_span_len"),
        (F.round(sentinel_share, 6) + F.lit(0.0)).alias("sentinel_share"),
    ).orderBy("source")
