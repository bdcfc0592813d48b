"""Byte-pair-encoding tokenizer training over the documents corpus
(Sennrich/Haddow/Birch, "Neural Machine Translation of Rare Words with
Subword Units", ACL 2016 — public paper): the canonical LLM-pipeline
step the rest of the curation stack feeds.

Classic word-type BPE: the corpus collapses to a (word, freq) type
table ONCE (the only corpus-scale step — one shuffle), each word
becomes a padded symbol sequence (chars + an explicit ``</w>``
end-of-word marker), and each training round (a) counts adjacent
symbol pairs weighted by word frequency, (b) picks the most frequent
pair with a (count DESC, left ASC, right ASC) tiebreak, (c) merges
that pair everywhere. The learned merge table IS the tokenizer.

The whole iterative loop is hash-pinned, not just audited: sequences
live as canonical padded strings (every symbol wrapped in single
spaces, so adjacent symbols are two-space separated and a merge is a
LITERAL string replace), and ``replace`` scans left-to-right
non-overlapping in Spark, DuckDB, and Python alike — exactly BPE's
greedy merge semantics — so the oracle replays all N rounds with
chained REPLACE CTEs and every (round, pair, count) row must match
bit-for-bit. Pair COUNTS intentionally include overlapping
occurrences ("a a a" counts (a,a) twice), the classic counting rule.

Scale shape: the type table is O(distinct words) — vocabulary grows
~ heaps-law-sublinearly with corpus size, which is why real BPE
trainers (GPT-2's included) run on type tables. Per round: one
in-row pair explode + one (l, r) partial-agg shuffle over the type
table, one 1-row argmax to the driver (the same driver-scalar role
as the CC convergence count), and an in-row literal replace. Nothing
per-round touches the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.data.skill_dictionary import values_df
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

BPE_ROUNDS = 8
_EOW = "</w>"


def _word_types(docs: DataFrame) -> DataFrame:
    """(word, freq): the corpus collapsed to its type table — the one
    corpus-scale aggregation of the whole trainer."""
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _initial_seqs(types: DataFrame) -> DataFrame:
    """(word, freq, s): each word as the canonical padded symbol
    string ' c1  c2  ...  </w> ' (single-space-wrapped symbols ⇒
    two-space separators) — the form a merge can act on as a literal
    left-to-right replace."""
    chars = F.expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))")
    return types.select(
        "word",
        "freq",
        F.concat(
            F.lit(" "), F.concat_ws("  ", chars), F.lit(f"  {_EOW} ")
        ).alias("s"),
    )


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """(l, r, cnt): adjacent symbol pairs weighted by word frequency —
    in-row pair construction (zip of the sequence with its own shift;
    a fully-merged single-symbol word yields an empty pair list, NOT a
    descending-sequence ANSI error), one (l, r) partial-agg shuffle."""
    pairs = F.expr(
        "zip_with("
        "  slice(split(trim(s), '  '), 1, greatest(size(split(trim(s), '  ')) - 1, 0)),"
        "  slice(split(trim(s), '  '), 2, greatest(size(split(trim(s), '  ')) - 1, 0)),"
        "  (x, y) -> struct(x AS l, y AS r))"
    )
    return (
        seqs.select("freq", F.explode(pairs).alias("p"))
        .select("freq", F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .groupBy("l", "r")
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_train(
    types: DataFrame, n_rounds: int = BPE_ROUNDS
) -> list[tuple[int, str, str, str, int]]:
    """Learn ``n_rounds`` merges; returns [(round, l, r, merged, cnt)].
    Each round's argmax is a single row pulled to the driver (the
    merge decision is inherently global); the type table itself never
    leaves the executors."""
    # LAZY checkpoints: each round's argmax .first() is the
    # materializing action for the round's replaced sequence table —
    # one fused job per round instead of two (the hierarchy-doubling
    # job-fold), and the LAST round's replace (whose output bpe_train
    # never reads) is never computed at all.
    seqs = _initial_seqs(types).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, str, int]] = []
    for k in range(1, n_rounds + 1):
        top = (
            _pair_counts(seqs)
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .first()
        )
        if top is None:  # fully merged corpus — nothing left to learn
            break
        merges.append((k, top["l"], top["r"], top["l"] + top["r"], top["cnt"]))
        seqs = seqs.withColumn(
            "s",
            F.replace(
                "s",
                F.lit(f" {top['l']}  {top['r']} "),
                F.lit(f" {top['l']}{top['r']} "),
            ),
        ).localCheckpoint(eager=False)
    return merges


def _bpe_blocks(n_rounds: int) -> str:
    """The training loop as chained CTE blocks — every per-round CTE
    MATERIALIZED (inlined CTEs would re-expand the whole chain per
    reference: exponentially many base scans), pair counting
    (overlap-inclusive), the tiebroken argmax, and the literal greedy
    REPLACE fed by scalar subqueries."""
    # Exhaustion safety: when the corpus fully merges before n_rounds,
    # t{k} is empty — its scalar subqueries COALESCE to a chr(1)
    # sentinel that occurs in no sequence, so the remaining rounds are
    # exact no-ops (matching bpe_train's early break) instead of
    # NULL-poisoning every later s{k}.
    blocks = [
        f"""types AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
      ) WHERE word <> '' GROUP BY word
    ),
    s0 AS MATERIALIZED (
      SELECT word, freq,
             ' ' || array_to_string(
               list_transform(range(1, length(word) + 1), i -> word[i:i]), '  '
             ) || '  {_EOW} ' AS s
      FROM types
    )"""
    ]
    for k in range(1, n_rounds + 1):
        blocks.append(f"""tok{k} AS (
      SELECT freq, unnest(string_split(trim(s), '  ')) AS tok,
             generate_subscripts(string_split(trim(s), '  '), 1) AS ord,
             word
      FROM s{k - 1}
    ),
    p{k} AS (
      SELECT a.tok AS l, b.tok AS r, SUM(a.freq) AS cnt
      FROM tok{k} a JOIN tok{k} b ON b.word = a.word AND b.ord = a.ord + 1
      GROUP BY a.tok, b.tok
    ),
    t{k} AS MATERIALIZED (
      SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1
    ),
    s{k} AS MATERIALIZED (
      SELECT word, freq,
             REPLACE(s,
                     COALESCE((SELECT ' ' || l || '  ' || r || ' ' FROM t{k}),
                              chr(1)),
                     COALESCE((SELECT ' ' || l || r || ' ' FROM t{k}),
                              chr(1))) AS s
      FROM s{k - 1}
    )""")
    return "WITH " + ",\n    ".join(blocks)


def _bpe_oracle(n_rounds: int = BPE_ROUNDS) -> str:
    unions = "\n      UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS round, l, r, l || r AS merged, "
        f"CAST(cnt AS BIGINT) AS cnt FROM t{k}"
        for k in range(1, n_rounds + 1)
    )
    return f"{_bpe_blocks(n_rounds)}\n    {unions}"


def bpe_apply(seqs: DataFrame, merges: list[tuple[int, str, str, str, int]]) -> DataFrame:
    """Apply a learned merge table to padded symbol sequences — the
    ENCODE side of the tokenizer: the same greedy literal replace, in
    merge order, entirely in-row."""
    for _, l, r, _, _ in merges:
        seqs = seqs.withColumn(
            "s", F.replace("s", F.lit(f" {l}  {r} "), F.lit(f" {l}{r} "))
        )
    return seqs


def _bpe_encode_oracle(n_rounds: int = BPE_ROUNDS) -> str:
    return f"""{_bpe_blocks(n_rounds)},
    tokf AS MATERIALIZED (
      SELECT word, freq, string_split(trim(s), '  ') AS toks FROM s{n_rounds}
    )
    SELECT CAST(SUM(freq) AS BIGINT) AS total_words,
           CAST(SUM(freq * len(toks)) AS BIGINT) AS total_tokens,
           CAST(SUM(freq * length(word)) AS BIGINT) AS total_chars,
           (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT)
            FROM (SELECT unnest(toks) AS tok FROM tokf)) AS vocab_size,
           CAST(SUM(freq * len(toks)) AS DOUBLE) / SUM(freq) AS tokens_per_word
    FROM tokf
    """


@query("bpe_encode_compression", oracle=_bpe_encode_oracle())
def bpe_encode_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level effect of ENCODING with the learned merges: token
    counts, subword vocabulary size, and tokens-per-word after
    BPE_ROUNDS merges — the number a tokenizer-budget decision reads.
    The oracle replays training AND encoding."""
    docs = load_table(spark, sf_dir, "documents")
    types = _word_types(docs).localCheckpoint(eager=False)
    merges = bpe_train(types)
    encoded = bpe_apply(_initial_seqs(types), merges)
    toks = F.split(F.trim(F.col("s")), "  ")
    per_word = encoded.select(
        "word", "freq", F.size(toks).cast("long").alias("n_toks"), toks.alias("toks")
    )
    vocab = per_word.select(F.explode("toks").alias("tok")).agg(
        F.countDistinct("tok").cast("long").alias("vocab_size")
    )
    return per_word.agg(
        F.sum("freq").cast("long").alias("total_words"),
        F.sum(F.col("freq") * F.col("n_toks")).cast("long").alias("total_tokens"),
        F.sum(F.col("freq") * F.length("word")).cast("long").alias("total_chars"),
        (
            F.sum(F.col("freq") * F.col("n_toks")).cast("double")
            / F.sum("freq")
        ).alias("tokens_per_word"),
    ).crossJoin(F.broadcast(vocab)).select(
        "total_words",
        "total_tokens",
        "total_chars",
        "vocab_size",
        "tokens_per_word",
    )


@query("bpe_train_merges", oracle=_bpe_oracle())
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge table: (round, l, r, merged, cnt) for
    BPE_ROUNDS rounds over the documents corpus — the oracle replays
    the ENTIRE training loop (type table, symbol init, overlap-
    inclusive pair counts, tiebroken argmax, greedy literal merge), so
    a drift anywhere in the iteration turns this driver row red."""
    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(_word_types(docs))
    if not merges:  # empty/degenerate corpus: empty typed result,
        # matching the oracle's zero union rows (values_df cannot
        # render an empty VALUES list)
        return spark.createDataFrame(
            [], "round long, l string, r string, merged string, cnt long"
        )
    return values_df(spark, merges, ["round", "l", "r", "merged", "cnt"]).select(
        F.col("round").cast("long"),
        "l",
        "r",
        "merged",
        F.col("cnt").cast("long"),
    )
