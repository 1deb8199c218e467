"""Shared constants for training-data ops.

Every operator in rify_spark.ops has a Spark implementation and a DuckDB SQL
generator that must produce bit-identical results; both sides read their
parameters from here. Hashing is md5-prefix based because md5 is the one
hash function Spark and DuckDB implement identically; 28-bit token hashes
keep (a*h + b) inside int64 for the universal-hash permutations.
"""

# universal-hash permutations for minhash: h_i(x) = (A_i * h28(x) + B_i) % MERSENNE_P
MINHASH_PERMS = [
    (1234567891, 98765),
    (2345678917, 87654),
    (1111111121, 76543),
    (1357924687, 65432),
    (1470258369, 54321),
    (1593571597, 43210),
    (1616161627, 32109),
    (1818181811, 21098),
    (1923456791, 19283),
    (2046913579, 28374),
    (2111111123, 37465),
    (2135792469, 46556),
    (1246813579, 55647),
    (1369258147, 64738),
    (1482736455, 73829),
    (1595959597, 82910),
]
# modulus must WRAP for (A*h + B) % P to be a universal hash family: with a
# 2^61-1 modulus the product A*h (< 2^59) never wraps, making every
# "permutation" order-preserving in h — all signatures pick the same
# min-hash feature (perfectly correlated). 2^31-1 > 2^28 (the h universe)
# and A*h >> P, so each (A_i, B_i) is a genuinely independent permutation.
MERSENNE_P = (1 << 31) - 1

# LSH banding over the 16 minhashes: 4 bands x 4 rows.
# Band-collision probability at Jaccard s is 1-(1-s^4)^4: ~0.9% at s=0.3,
# ~99% at s=0.9 — candidates stay O(near-duplicates) instead of the ~all-pairs
# blowup the old 4x2 banding produced (s^2 collides 31% of 0.3-similar pairs).
LSH_BANDS = 4
LSH_ROWS = 4

SIMHASH_BITS = 16

NGRAM_N = 3                  # word shingle width for jaccard
JACCARD_THRESHOLD = 0.8
# shingle document-frequency cap (per source block) for the ngram-jaccard
# self-join: a shingle shared by more than this many docs in one block is
# dropped from the Jaccard universe BEFORE the join. Without it one hot
# shingle ("of the and" across 10^6 docs) emits ~10^12 join rows; with it
# the join is O(docs * shingles_per_doc * CAP) — linear in the corpus.
# Jaccard is then EXACT over the capped universe (na/nb count kept
# shingles), the same definition on both engines.
NGRAM_DF_CAP = 64

KNN_QUANT = 1000             # embedding quantization factor (float -> int)
KNN_K = 10
KNN_N_QUERIES = 10

# deterministic +/-1 hyperplanes for sign-random-projection LSH over
# 64-dim embeddings: HYPERPLANES[b][d] in {-1, +1}, derived from a fixed
# LCG so both the Spark literals and the generated SQL agree.
N_HYPERPLANES = 8
EMB_DIM = 64


def _lcg_bits(n: int, seed: int = 0x2545F4914F6CDD1D):
    x = seed
    out = []
    for _ in range(n):
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 64)
        out.append(1 if (x >> 33) & 1 else -1)
    return out


_flat = _lcg_bits(N_HYPERPLANES * EMB_DIM)
HYPERPLANES = [
    _flat[b * EMB_DIM : (b + 1) * EMB_DIM] for b in range(N_HYPERPLANES)
]

# --- banded sign-LSH for embedding near-dup (auto-scaled) --------------------
# The near-dup candidate join must stay linear as the corpus grows, so the
# per-band bit width r is derived from the corpus size the way
# ivf_auto_params derives NLIST: r = ceil(log2(n / EMB_BUCKET_TARGET)) keeps
# expected bucket occupancy ~EMB_BUCKET_TARGET, making the in-bucket
# self-join O(n * TARGET) instead of O(n^2 / 2^const). A SINGLE auto-widened
# bucket would trade that for recall (P[>=2 sign flips among r planes] grows
# with r), so the index is EMB_NEARDUP_BANDS independent bands, each with its
# own r planes and Hamming-1 multi-probe: a 0.99-cosine pair (flip prob
# p ~ 0.016/plane) escapes one band with prob ~C(r,2)p^2 ~ 1e-2, and all
# four independent bands with ~1e-8 — planted recall stays 1.0 while bucket
# size stays ~TARGET. Planes come from one LCG pool (band j owns the pool
# slice [j*EMB_BAND_BITS_MAX, j*EMB_BAND_BITS_MAX + r)), so both engines
# materialize identical literals; EMB_BAND_BITS_MAX = 20 caps the pool (2^20
# buckets/band covers ~67M vectors at TARGET=64; past the cap bucket size
# grows linearly — same documented bound as IVF_NLIST_MAX).
EMB_NEARDUP_BANDS = 4
EMB_BAND_BITS_MIN = 8
EMB_BAND_BITS_MAX = 20
EMB_BUCKET_TARGET = 64

_pool_flat = _lcg_bits(EMB_NEARDUP_BANDS * EMB_BAND_BITS_MAX * EMB_DIM)
HYPERPLANE_POOL = [
    _pool_flat[b * EMB_DIM : (b + 1) * EMB_DIM]
    for b in range(EMB_NEARDUP_BANDS * EMB_BAND_BITS_MAX)
]


def emb_band_bits(n: int) -> int:
    """Per-band hyperplane count from the corpus size (pre-planting count,
    matching the SQL twin's scalar subquery over `embeddings`)."""
    import math

    return max(
        EMB_BAND_BITS_MIN,
        min(
            EMB_BAND_BITS_MAX,
            math.ceil(math.log2(max(n, 1) / EMB_BUCKET_TARGET)),
        ),
    )

# benchmark decontamination (ops.decon): flag docs sharing >= DECON_MIN_HITS
# distinct DECON_N-word n-grams with the eval set. The eval set is a
# DECON_EVAL_RATE hash-sample of docs, each contributing the
# DECON_EXCERPT_LEN-token excerpt starting at 1-based token
# DECON_EXCERPT_START — planted contamination scoring
# DECON_EXCERPT_LEN - DECON_N + 1 = 16 hits per source doc whose excerpt
# n-grams are pairwise distinct (repetitive excerpts collapse under
# distinctness and may fall below the threshold); MIN_HITS = 4 separates
# true leaks from single-n-gram hash noise.
DECON_N = 5
DECON_EVAL_RATE = 0.02
DECON_EXCERPT_START = 11
DECON_EXCERPT_LEN = 20
DECON_MIN_HITS = 4

# corpus-level top-K n-gram frequency (ops/text.py::top_ngrams): K-heap
# top-k per partition (TakeOrderedAndProject), never a global sort; ties
# broken by the n-gram string so both engines pick the same boundary rows
TOPNGRAM_N = 2
TOPNGRAM_K = 100

# language-ID marker words (n-gram heuristic): presence counts decide 'en'
LANG_MARKERS = ["the", "and", "with", "from", "value", "table"]
LANG_EN_MIN_HITS = 1

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "for", "with", "on"]

# document chunking (ops/text.py chunk_docs): token-window size and overlap
# for training-sequence preparation; STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP.
# windows start at k*STRIDE while the previous window hasn't already
# covered the tail: n_chunks = max(1, ceil((n_tok - OVERLAP) / STRIDE))
CHUNK_TOKENS = 64
CHUNK_OVERLAP = 8

# sequence packing (ops/text.py pack_offsets): fixed token budget per
# training sequence; documents concatenate in doc_id order and split at
# budget boundaries (concat-then-chunk)
PACK_SEQ_TOKENS = 256
