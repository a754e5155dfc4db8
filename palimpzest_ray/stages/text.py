"""Text-analysis stages over a documents table.

Every kernel is vectorized (pyarrow.compute / numpy) and runs inside
``map_batches`` on zero-copy Arrow batches; there is no per-row Python
in any hot path. The reference has no scalar-function library at all —
row-level computation there is user UDFs or LLM calls (SURVEY.md §2.3
"Scalar functions") — so these stages are engine additions, with
semantics chosen to be exactly SQL-expressible so the duckdb oracle can
verify them value-for-value:

- ``token_count``  : whitespace tokens = ``len(string_split(text, ' '))``
- ``bpe_token_count``: BPE-ish regex tokens = ``\\w+|[^\\w\\s]`` matches
- ``word_stats``   : n_words, alpha/digit/space char counts, quality score
- ``language_id``  : argmax over per-language stopword hit counts
  (the SQL oracle is *generated from the same constant table*, see
  :func:`language_id_sql`)
- ``fingerprint``  : stable 64-bit xxhash of the text (not SQL-expressible;
  verified by a rows/pytest oracle instead)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from palimpzest_ray.functions.tokens import stable_hash

# Stopword table for the n-gram language heuristic. Deliberately tiny
# and whole-word: the SQL oracle counts the same words with
# regexp_extract_all, so both sides are the same pure function of text.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "de": ("der", "die", "und", "das", "nicht"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "las", "una", "que"),
}
LANG_ORDER = tuple(LANG_STOPWORDS)  # tie-break: first language wins
BPE_PATTERN = r"\w+|[^\w\s]"


def _count_words(col: pa.ChunkedArray | pa.Array, word: str) -> np.ndarray:
    """Whole-word occurrence count per row, vectorized."""
    n = pc.count_substring_regex(col, rf"\b{word}\b")
    return n.to_numpy(zero_copy_only=False).astype(np.int64)


def token_count(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Whitespace token count with ``split(' ')`` semantics (empty runs
    count), matching duckdb ``len(string_split(text, ' '))``."""
    return pc.list_value_length(pc.split_pattern(col, " ")).cast(pa.int64())


def bpe_token_count(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """BPE-ish token count: number of ``\\w+|[^\\w\\s]`` matches,
    matching duckdb ``len(regexp_extract_all(text, ...))``."""
    return pc.count_substring_regex(col, BPE_PATTERN).cast(pa.int64())


def add_word_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_words / n_alpha / n_digit / n_space / quality_ppm.

    quality_ppm = floor(n_alpha * 1e6 / greatest(n_chars,1)) as int64 — a
    printable-density heuristic in parts-per-million; low values flag
    boilerplate/garbage. Integer floor (not round) on purpose: numpy
    rounds half-to-even, duckdb half-away-from-zero, so a rounded float
    column can differ at exact .5 boundaries while floor of the same
    IEEE division is bit-identical in both engines.
    """
    col = batch[text_col]
    n_chars = pc.utf8_length(col).cast(pa.int64())
    n_words = token_count(col)
    n_alpha = pc.count_substring_regex(col, r"[A-Za-z]").cast(pa.int64())
    n_digit = pc.count_substring_regex(col, r"[0-9]").cast(pa.int64())
    n_space = pc.count_substring_regex(col, r" ").cast(pa.int64())
    denom = pc.max_element_wise(n_chars, pa.scalar(1, pa.int64())).cast(pa.float64())
    quality = pc.floor(
        pc.divide(pc.multiply(n_alpha.cast(pa.float64()), pa.scalar(1e6)), denom)
    ).cast(pa.int64())
    for name, arr in [
        ("n_words", n_words),
        ("n_alpha", n_alpha),
        ("n_digit", n_digit),
        ("n_space", n_space),
        ("quality_ppm", quality),
    ]:
        batch = batch.append_column(name, arr)
    return batch


def add_language_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append ``lang_pred``: argmax over per-language stopword counts,
    ``und`` (undetermined) when no stopword hits at all. Ties break by
    LANG_ORDER. Vectorized: one regex count per stopword."""
    col = batch[text_col]
    scores = np.zeros((len(LANG_ORDER), batch.num_rows), dtype=np.int64)
    for i, lang in enumerate(LANG_ORDER):
        for w in LANG_STOPWORDS[lang]:
            scores[i] += _count_words(col, w)
    best = scores.argmax(axis=0)  # first max wins = LANG_ORDER tie-break
    pred = np.array(LANG_ORDER, dtype=object)[best]
    pred[scores.max(axis=0) == 0] = "und"
    return batch.append_column("lang_pred", pa.array(pred, type=pa.string()))


def language_id_sql(text_col: str = "text") -> str:
    """The duckdb expression equivalent to :func:`add_language_id`,
    generated from the SAME stopword table so the two can never drift."""

    def score(lang: str) -> str:
        terms = [
            f"len(regexp_extract_all({text_col}, '\\b{w}\\b'))"
            for w in LANG_STOPWORDS[lang]
        ]
        return "(" + " + ".join(terms) + ")"

    greatest = "greatest(" + ", ".join(score(l) for l in LANG_ORDER) + ")"
    case = "case when " + greatest + " = 0 then 'und' "
    # first language reaching the max wins — same order as numpy argmax
    for lang in LANG_ORDER:
        case += f"when {score(lang)} = {greatest} then '{lang}' "
    return case + "end"


def add_fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append ``fp``: stable 64-bit document fingerprint (xxhash via
    polars, fixed seed — stable across processes, see
    ``functions/tokens.py``). Not SQL-expressible; verified by the
    rows-only driver check + a pytest determinism oracle."""
    fp = stable_hash(batch[text_col])
    return batch.append_column("fp", pa.array(fp.astype(np.uint64)))


def add_token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    batch = batch.append_column("n_ws_tokens", token_count(batch[text_col]))
    return batch.append_column("n_bpe_tokens", bpe_token_count(batch[text_col]))


# Each pattern is RE2-compatible (pyarrow) AND duckdb-compatible, so the
# oracle runs the SAME expressions — no lookarounds/backrefs.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # ORDER MATTERS: longest/most-specific digit runs first, so a
    # contiguous 16-digit card is <CC> before the phone pattern can
    # consume its first digits; ssn/ip before phone for the same reason.
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "credit_card": (r"\b\d(?:[ -]?\d){12,15}\b", "<CC>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # country code optional as a UNIT — plain US '555-123-4567' and
    # '(555) 123-4567' must redact too
    "phone": (r"(?:\+?\d{1,3}[-. (]*)?\d{3}[-. )]*\d{3}[-. ]*\d{4}", "<PHONE>"),
}


def redact_pii(
    batch: pa.Table,
    text_col: str = "text",
    *,
    kinds: list[str] | None = None,
    out: str | None = None,
) -> pa.Table:
    """Regex PII redaction for training corpora (emails, phones, SSNs,
    IPs, card numbers) — chained RE2 ``replace_substring_regex``
    kernels, one pass per pattern, zero row loops. Patterns are
    deliberately duckdb-compatible so ``redact_pii_sql`` is a
    bit-exact oracle. Heuristic by design (recall over precision — a
    corpus scrubber, not a compliance tool). ``kinds=[]`` redacts
    nothing (None = all)."""
    kinds = list(PII_PATTERNS) if kinds is None else kinds
    col = batch[text_col]
    for k in kinds:
        pat, repl = PII_PATTERNS[k]
        col = pc.replace_substring_regex(col, pattern=pat, replacement=repl)
    name = out or f"{text_col}_redacted"
    return batch.append_column(name, col)


def redact_pii_sql(text_col: str = "text", kinds: list[str] | None = None) -> str:
    """The duckdb expression equivalent to :func:`redact_pii` (same
    patterns, same order)."""
    kinds = list(PII_PATTERNS) if kinds is None else kinds
    expr = text_col
    for k in kinds:
        pat, repl = PII_PATTERNS[k]
        # duckdb string literals are SQL-standard: backslashes pass
        # through verbatim, only quotes need doubling
        pat_sql = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat_sql}', '{repl}', 'g')"
    return expr


def normalize_text(
    batch: pa.Table, text_col: str = "text", out_col: str = "text_norm"
) -> pa.Table:
    """Training-corpus text canonicalization: Unicode NFC → lowercase →
    collapse whitespace runs → trim. Chosen to be exactly duckdb's
    ``trim(regexp_replace(lower(nfc_normalize(x)), '\\s+', ' ', 'g'))``
    (see :func:`normalize_text_sql`) so dedup/fingerprint stages built
    on it compare canonical forms across engines."""
    import unicodedata

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # NFC has no Arrow kernel; unicodedata.normalize is a C call per row
    arr = pa.array(
        [None if t is None else unicodedata.normalize("NFC", t) for t in col.to_pylist()],
        pa.string(),
    )
    arr = pc.utf8_lower(arr)
    arr = pc.replace_substring_regex(arr, r"\s+", " ")
    arr = pc.utf8_trim(arr, " ")  # duckdb trim strips spaces only
    return batch.append_column(out_col, arr)


def normalize_text_sql(text_col: str = "text") -> str:
    """The exact SQL replay of :func:`normalize_text`."""
    return rf"trim(regexp_replace(lower(nfc_normalize({text_col})), '\s+', ' ', 'g'))"


def chunk_text(
    batch: pa.Table,
    *,
    chunk_size: int,
    overlap: int = 0,
    text_col: str = "text",
) -> pa.Table:
    """RAG-style 1:N chunking: fixed-size character windows with
    ``overlap`` carried between neighbors. Emits one row per chunk with
    ``chunk_idx`` / ``chunk_start`` / ``chunk``; every document yields
    at least one chunk (empty text → one empty chunk). Character-based
    (``substr`` semantics), so the duckdb oracle is exact:

        n_chunks = ceil(max(len - overlap, 1) / (chunk_size - overlap))
        chunk_i  = substr(text, i*step + 1, chunk_size)

    Vectorized explode: ``np.repeat`` of the parent batch + per-chunk
    slicing (parents replicated once, payload column dropped first if
    huge is the caller's choice)."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    step = chunk_size - overlap
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    texts = col.to_pylist()
    lens = np.array([len(t) if t else 0 for t in texts], dtype=np.int64)
    n_chunks = (np.maximum(lens - overlap, 1) + step - 1) // step
    idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), n_chunks)
    starts_of = np.zeros(batch.num_rows + 1, dtype=np.int64)
    np.cumsum(n_chunks, out=starts_of[1:])
    chunk_idx = np.arange(len(idx), dtype=np.int64) - starts_of[idx]
    chunk_start = chunk_idx * step
    chunks = pa.array(
        [
            None if texts[r] is None else texts[r][s : s + chunk_size]
            for r, s in zip(idx, chunk_start)
        ],
        pa.string(),
    )
    out = batch.take(pa.array(idx, pa.int64()))
    return (
        out.append_column("chunk_idx", pa.array(chunk_idx, pa.int64()))
        .append_column("chunk_start", pa.array(chunk_start, pa.int64()))
        .append_column("chunk", chunks)
    )


# --------------------------------------------------------------------------
# benchmark decontamination
# --------------------------------------------------------------------------


def _norm_padded(col: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """`` `` + whitespace-normalized lowercase text + `` `` — word-
    boundary containment then reduces to plain substring containment
    (the same construction a SQL oracle states verbatim:
    ``' ' || trim(regexp_replace(lower(text), '\s+', ' ', 'g')) || ' '``)."""
    t = pc.replace_substring_regex(pc.utf8_lower(col), r"\s+", " ")
    t = pc.utf8_trim(t, " ")
    return pc.binary_join_element_wise(pa.scalar(" "), t, pa.scalar(" "), "")


def _normalize_snippets(snippets) -> list[str]:
    out = []
    for s in snippets:
        w = " ".join(str(s).lower().split())
        if w:
            out.append(w)
    return sorted(set(out))


def _contaminated_mask(col, snippets: list[str]) -> "np.ndarray":
    nd = _norm_padded(col)
    mask = np.zeros(len(col), dtype=bool)
    for s in snippets:
        mask |= pc.match_substring(nd, f" {s} ").to_numpy(zero_copy_only=False)
    return mask


def decontaminate(
    ds: rd.Dataset,
    snippets,
    *,
    text_col: str = "text",
    method: str = "auto",
    mode: str = "drop",
    ngram_width: int = 8,
):
    """Benchmark decontamination: remove (or flag) documents whose
    normalized word sequence CONTAINS any eval snippet's word sequence
    contiguously — the standard pre-training hygiene step that keeps
    eval sets out of the corpus. Word-boundary semantics: lowercase,
    collapse whitespace runs, match whole-word runs (never mid-word).

    ``method``:
      - ``"contains"`` — one vectorized substring scan per snippet per
        batch. Right for benchmark-sized snippet lists (≤ a few
        hundred).
      - ``"ngram"`` — the scale path for large snippet sets: each
        snippet contributes ONE word-n-gram hash (its first
        ``min(len, ngram_width)``-gram); docs compute the same rolling
        shingle hashes (``stages.dedup`` machinery, zero-copy numpy)
        and only hash-candidate rows pay the exact contains verify.
        Recall is total: any occurrence of a snippet contains the
        snippet's own first n-gram as a doc n-gram; false candidates
        are removed by the verify, so the output is EXACTLY the
        contains semantics at a fraction of the scans.
      - ``"auto"`` — ngram when more than 64 snippets.

    ``mode``: ``"drop"`` returns only clean docs; ``"flag"`` returns
    every doc plus a boolean ``contaminated`` column (audit path).
    """
    from palimpzest_ray.stages.dedup import _shingle_hashes, _word_hashes

    snips = _normalize_snippets(snippets)
    if method == "auto":
        method = "ngram" if len(snips) > 64 else "contains"
    if method not in ("contains", "ngram"):
        raise ValueError(f"unknown method {method!r}")
    if mode not in ("drop", "flag"):
        raise ValueError(f"unknown mode {mode!r}")
    if not snips:
        if mode == "drop":
            return ds
        return ds.map_batches(
            lambda b: b.append_column(
                "contaminated", pa.array(np.zeros(b.num_rows, bool))
            ),
            batch_format="pyarrow",
        )

    # per distinct n: the snippet first-n-gram hash set (driver-side,
    # snippet lists are benchmark-sized)
    probe_sets: dict[int, np.ndarray] = {}
    if method == "ngram":
        by_n: dict[int, list] = {}
        for s in snips:
            n_s = min(len(s.split()), max(1, ngram_width))
            by_n.setdefault(n_s, []).append(s)
        for n_s, group in by_n.items():
            h, parents = _word_hashes(pa.array(group))
            sh, sp = _shingle_hashes(h, parents, n_s)
            # first shingle per snippet
            first = np.ones(len(sp), dtype=bool)
            first[1:] = sp[1:] != sp[:-1]
            probe_sets[n_s] = np.unique(sh[first])

    def _fn(batch: pa.Table) -> pa.Table:
        from palimpzest_ray.functions.tokens import limit_kernel_threads

        limit_kernel_threads()
        col = batch[text_col]
        if batch.num_rows == 0:
            mask = np.zeros(0, dtype=bool)
        elif method == "contains":
            mask = _contaminated_mask(col, snips)
        else:
            cand = np.zeros(batch.num_rows, dtype=bool)
            h, parents = _word_hashes(col)
            for n_s, probe in probe_sets.items():
                sh, sp = _shingle_hashes(h, parents, n_s)
                hit = np.isin(sh, probe)
                if hit.any():
                    cand[np.unique(sp[hit])] = True
            mask = np.zeros(batch.num_rows, dtype=bool)
            if cand.any():
                idx = np.flatnonzero(cand)
                sub = col.combine_chunks().take(pa.array(idx))
                mask[idx] = _contaminated_mask(sub, snips)
        if mode == "flag":
            return batch.append_column("contaminated", pa.array(mask))
        return batch.filter(pa.array(~mask))

    return ds.map_batches(_fn, batch_format="pyarrow")


def decontaminate_sql(snippets, text_col: str = "text") -> str:
    """The WHERE clause stating clean-ness — the oracle twin of
    :func:`decontaminate` (word-boundary containment on normalized
    text)."""
    nd = (
        f"' ' || trim(regexp_replace(lower({text_col}), '\s+', ' ', 'g'), ' ') || ' '"
    )
    conds = [
        "not contains(" + nd + ", ' " + s.replace("'", "''") + " ')"
        for s in _normalize_snippets(snippets)
    ]
    return " and ".join(conds) if conds else "true"


def _contains_subseq(doc: np.ndarray, snip: np.ndarray) -> bool:
    """Contiguous subsequence containment, vectorized: candidate start
    positions are where the first element matches; each further snippet
    position prunes the survivors with one vectorized compare (≤ m
    passes over a shrinking index set, no Python inner loop per row)."""
    n, m = len(doc), len(snip)
    if m == 0:
        return True
    if m > n:
        return False
    starts = np.flatnonzero(doc[: n - m + 1] == snip[0])
    for j in range(1, m):
        if len(starts) == 0:
            return False
        starts = starts[doc[starts + j] == snip[j]]
    return len(starts) > 0


def decontaminate_tokens(
    ds: rd.Dataset,
    snippet_token_seqs,
    *,
    tokens_col: str = "tokens",
    ngram_width: int = 8,
):
    """Token-level decontamination over pre-tokenized sequences (the
    lake's native payload): drop rows whose ``tokens`` contain any eval
    snippet's token sequence contiguously. Same candidate-then-verify
    shape as :func:`decontaminate`: each snippet contributes ONE
    rolling n-gram hash over its first ``min(len, ngram_width)``
    tokens; docs compute the same rolling hashes zero-copy from the
    flattened list column, and only hash-candidates pay the exact
    subsequence verify. Recall is total (an occurrence contains the
    snippet's own first n-gram); the verify removes false candidates,
    so the output is exactly subsequence-containment semantics.
    """
    from palimpzest_ray.stages.dedup import _shingle_hashes

    snips = [np.asarray(s, dtype=np.int64) for s in snippet_token_seqs]
    snips = [s for s in snips if len(s)]
    if not snips:
        return ds

    probe_sets: dict[int, np.ndarray] = {}
    by_n: dict[int, list[np.ndarray]] = {}
    for s in snips:
        by_n.setdefault(min(len(s), max(1, ngram_width)), []).append(s)
    for n_s, group in by_n.items():
        heads, parents = [], []
        for i, s in enumerate(group):
            heads.append(s[:n_s])
            parents.append(np.full(n_s, i, dtype=np.int64))
        sh, sp = _shingle_hashes(
            np.concatenate(heads).astype(np.uint64),
            np.concatenate(parents),
            n_s,
        )
        first = np.ones(len(sp), dtype=bool)
        first[1:] = sp[1:] != sp[:-1]
        probe_sets[n_s] = np.unique(sh[first])

    def _fn(batch: pa.Table) -> pa.Table:
        from palimpzest_ray.functions.tokens import limit_kernel_threads

        limit_kernel_threads()
        if batch.num_rows == 0:
            return batch
        col = batch[tokens_col].combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.int64)
        parents = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
        cand = np.zeros(batch.num_rows, dtype=bool)
        h = flat.astype(np.uint64)  # identity "hash": ints are their own key
        for n_s, probe in probe_sets.items():
            sh, sp = _shingle_hashes(h, parents, n_s)
            hit = np.isin(sh, probe)
            if hit.any():
                cand[np.unique(sp[hit])] = True
        mask = np.zeros(batch.num_rows, dtype=bool)
        if cand.any():
            offs = np.zeros(batch.num_rows + 1, dtype=np.int64)
            lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
            np.cumsum(np.nan_to_num(lens.astype(np.float64)).astype(np.int64),
                      out=offs[1:])
            for i in np.flatnonzero(cand):
                doc = flat[offs[i]:offs[i + 1]]
                mask[i] = any(_contains_subseq(doc, s) for s in snips)
        return batch.filter(pa.array(~mask))

    return ds.map_batches(_fn, batch_format="pyarrow")
