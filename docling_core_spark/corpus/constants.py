"""Shared deterministic constants for corpus operators.

Both the Spark implementation and the DuckDB oracle SQL are generated from
these values, so the two sides cannot drift. All randomness is a fixed
LCG evaluated at import time (never at job time) — reproducible across
processes and engines.
"""

from __future__ import annotations

# --- base hashing ---------------------------------------------------------
# H30(s): take md5 hex, first 15 nibbles -> 60-bit int, mod 2^30.
# Computable identically in Spark SQL (conv/substr/md5) and DuckDB
# (('0x'||substr(md5,1,15))::BIGINT). 30-bit range keeps a*h+b < 2^63
# in both engines (DuckDB raises on BIGINT overflow; Java wraps — we must
# stay in range so neither path is exercised).
H30_MOD = 1 << 30
MINHASH_P = 1_000_000_007

# --- MinHash --------------------------------------------------------------
SHINGLE_K = 3          # word-shingle width
NUM_PERMS = 16
LSH_BANDS = 4
ROWS_PER_BAND = NUM_PERMS // LSH_BANDS
JACCARD_THRESHOLD = 0.5
# min-label propagation fixpoint cap for connected-component clustering:
# rounds needed = component diameter; near-dup components are dense, so
# real corpora converge in a handful — 32 is a generous runaway guard
CC_MAX_ROUNDS = 32
# inverted-index exact-Jaccard join: shingles whose document frequency
# exceeds this are dropped from the posting index (and from BOTH
# engines' Jaccard sets — the oracle applies the same cap, so the
# semantics stay cross-engine identical when it fires). A shingle in
# >100k documents is corpus boilerplate with no discriminative value;
# without the cap the posting self-join grows O(sum df^2) — the
# standard stop-shingle guard of the AllPairs/PPJoin family.
JACCARD_MAX_DF = 100_000
# edit-distance second-stage verification of near-dup pairs runs on a
# fixed text PREFIX: Levenshtein is O(len_a * len_b) per pair, so both
# engines cap the operand length to keep the per-pair cost a constant
# (256^2 cell ops) independent of document size — full-text edit
# distance on a pathological 1 MB pair would be 10^12 cells.
EDIT_PREFIX = 256
# code-vs-prose detection (corpus/filters.py q_code_detect): a fixed
# keyword vocabulary plus integer ppm thresholds. The rule is the
# standard cheap pre-filter that routes documents to a code pipeline
# (tokenizer, dedup granularity and quality rules all differ for
# code); thresholds are corpus-tunable constants, and both engines
# evaluate the identical rule.
CODE_KEYWORDS = (
    "def", "class", "return", "import", "function", "var", "const",
    "if", "else", "for", "while", "int", "void", "public", "static",
)
CODE_SYM_PPM_MIN = 20_000      # >= 2% code punctuation density
CODE_KW_HITS_MIN = 2           # plus at least 2 keyword tokens
CODE_INDENT_PPM_MIN = 300_000  # or >= 30% structurally indented lines
# below this many edges the clustering finishes locally in ONE task
# (union-find over the edge subgraph) instead of iterating shuffle
# rounds — the standard last step of the MapReduce CC algorithms
# (Kiveris et al., SoCC'14 §3: "once the graph fits on one machine").
# 5M edges ~ 80 MB of longs: trivially within one executor task.
CC_LOCAL_EDGE_LIMIT = 5_000_000


def _lcg(seed: int):
    state = seed & 0x7FFFFFFF
    while True:
        state = (1103515245 * state + 12345) & 0x7FFFFFFF
        yield state


def _gen_perms(n: int):
    g = _lcg(20240613)
    perms = []
    for _ in range(n):
        a = (next(g) % (H30_MOD - 1)) | 1   # odd, < 2^30
        b = next(g) % H30_MOD
        perms.append((a, b))
    return perms


MINHASH_PERMS = _gen_perms(NUM_PERMS)

# --- SimHash --------------------------------------------------------------
SIMHASH_BITS = 32
# Manku/Jain/Sarma WWW'07 hamming-ball blocking: split the fingerprint
# into SIMHASH_BLOCKS blocks; any pair within hamming distance
# SIMHASH_HAMMING_MAX differs in at most that many blocks, so keying
# each C(BLOCKS, BLOCKS - HAMMING_MAX) combination of intact blocks
# guarantees every qualifying pair collides in >= 1 table (pigeonhole).
SIMHASH_BLOCK_SIZES = (6, 6, 5, 5, 5, 5)  # sums to SIMHASH_BITS
SIMHASH_HAMMING_MAX = 3

# --- embedding LSH (random-hyperplane, Rademacher ±1) ---------------------
# Banded multi-probe scheme, OR-amplified exactly like the minhash path:
# EMB_BANDS independent bands of EMB_PLANES_PER_BAND hyperplanes each,
# 2^EMB_PLANES_PER_BAND = 256 buckets per band. A pair is a candidate if
# it collides in ANY band, so recall amplifies with bands while each
# band's in-bucket join stays O(n^2/256) — the blocking that survives a
# 10^12-row corpus (a single 16-bucket table would be quadratic).
EMB_DIM = 64
EMB_BANDS = 16
EMB_PLANES_PER_BAND = 8
NUM_HYPERPLANES = EMB_BANDS * EMB_PLANES_PER_BAND


def _gen_hyperplanes(n: int, dim: int):
    """Balanced ±1 planes via deterministic Fisher-Yates. Balance (sum=0)
    makes the projection insensitive to a common mean component, and the
    shuffle avoids the LCG low-bit parity artifact (raw `state % 2`
    alternates, which collapses all planes onto two buckets)."""
    g = _lcg(77000321)
    out = []
    for _ in range(n):
        p = [1] * (dim // 2) + [-1] * (dim // 2)
        for i in range(dim - 1, 0, -1):
            j = next(g) % (i + 1)
            p[i], p[j] = p[j], p[i]
        out.append(p)
    return out


HYPERPLANES = _gen_hyperplanes(NUM_HYPERPLANES, EMB_DIM)


def band_planes(b: int):
    """The EMB_PLANES_PER_BAND hyperplanes of band b."""
    return HYPERPLANES[
        b * EMB_PLANES_PER_BAND:(b + 1) * EMB_PLANES_PER_BAND
    ]

# the synthetic embedding clusters are loose (max pairwise cos ~0.45), so
# the "near-dup" gate is set where it actually separates planted structure
COSINE_NEARDUP_THRESHOLD = 0.30
KNN_K = 5
ANN_K = 3
KNN_NUM_QUERIES = 8     # vec_id < 8 are the query set

# --- fingerprinting (MOD-p selection over char k-grams) -------------------
FP_CHARGRAM_K = 5
FP_SELECT_MOD = 8

# --- tokenization / language-ID / quality ---------------------------------
BPE_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

STOPWORDS = {
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist",
           "nicht"],
    "en": ["the", "of", "and", "to", "in", "is", "was", "that", "for",
           "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "del"],
    "fr": ["le", "les", "des", "et", "une", "du", "est", "dans", "pour",
           "que"],
}
LANGS = sorted(STOPWORDS)  # deterministic CASE order: de, en, es, fr
