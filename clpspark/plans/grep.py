"""Wildcard search over encoded events — CLP's grep as a Spark plan rewrite.

The reference compiles a wildcard query into subqueries of (logtype-pattern,
variable constraints) by probing the dictionaries BEFORE touching data
(clp/GrepCore.hpp:148-265, 328-422; EncodedVariableInterpreter.hpp:437-511),
then scans only rows whose logtype_id/vars can match, with a final
wildcard_match on the decoded message (clp/Grep.cpp:81-140).

Spark-first re-creation (plan-time, no custom Catalyst rules needed):

  1. probe the (small, broadcastable) dictionaries on the driver:
       - exact variable tokens in the query -> encoded int/float literal or
         var-dict ids; a token with no dict match proves the query
         unsatisfiable -> ``lit(False)`` (the reference's WontMatch
         short-circuit, GrepCore.hpp:407-419)
       - a logtype LIKE pattern (query with variable tokens wildcarded)
         selects candidate logtype_ids -> ``logtype_id.isin([...])``
  2. the rewritten predicate is handed to Catalyst: isin on the partition
     column prunes sinks (partitionBy(logtype_id) layout), array_contains
     prunes rows, all JVM-side
  3. survivors are decoded (broadcast dict join in an Arrow UDF) and checked
     with the exact wildcard match — same final-check structure as the
     reference.

Everything here is a *pre-filter*: correctness never depends on step 1 being
tight, only on step 3.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clpspark.ref import encoder as E
from clpspark.ref.wildcard import (
    clean_up_wildcard_search_string,
    wildcard_to_like,
)

_WILDCARDS = "*?"

# Logtype-dictionary driver-residency gate. CLP bounds dictionary growth by
# splitting archives, and the reference scans its in-memory dictionary per
# query (clp/DictionaryReader.hpp:243-307) — but a merged/catalog-scale
# dictionary must NOT be collected to the driver. Past these caps the
# wildcard probe runs as a filtered Spark scan instead (only matching ids
# come back), mirroring the byte guard the var-dict decode already has
# (operators/decode.py resolve_decode_mode).
LOGTYPE_COLLECT_MAX_ENTRIES = 100_000
LOGTYPE_COLLECT_MAX_BYTES = 64 << 20
# A Spark-side probe matching more ids than this carries no pruning power
# worth an isin() of that size — treat the query as logtype-unconstrained.
LOGTYPE_PROBE_MAX_IDS = 10_000


def _query_tokens(query: str) -> list[tuple[str, bool]]:
    """Split a cleaned wildcard query into maximal non-delim token runs.

    Returns (token, exact) pairs where ``exact`` means the token is bounded
    by real delimiters on both sides (not adjacent to a wildcard and not at
    the string edge), so it must appear verbatim as one token in any matching
    message — the reference's QueryToken 'is_var' precondition
    (clp/QueryToken.cpp).
    """
    toks: list[tuple[str, bool]] = []
    n = len(query)
    i = 0
    while i < n:
        c = query[i]
        if c == "\\" and i + 1 < n:
            i += 2
            continue
        if not E.is_delim(c) and c not in _WILDCARDS:
            j = i
            while j < n and not E.is_delim(query[j]) and query[j] not in _WILDCARDS:
                j += 1
            left_ok = i > 0 and E.is_delim(query[i - 1]) and query[i - 1] not in _WILDCARDS
            right_ok = j < n and E.is_delim(query[j]) and query[j] not in _WILDCARDS
            toks.append((query[i:j], left_ok and right_ok))
            i = j
        else:
            i += 1
    return toks


def _logtype_like_pattern(query: str) -> str:
    """Query text with variable-classified tokens replaced by '%' -> a LIKE
    pattern over logtype strings (conservative: matches a superset)."""
    out: list[str] = []
    n = len(query)
    i = 0
    while i < n:
        c = query[i]
        if c == "\\" and i + 1 < n:
            out.append("%")  # escaped literal may sit anywhere; stay loose
            i += 2
            continue
        if c in _WILDCARDS:
            out.append("%")
            i += 1
            continue
        if not E.is_delim(c):
            j = i
            while j < n and not E.is_delim(query[j]) and query[j] not in _WILDCARDS:
                j += 1
            tok = query[i:j]
            # a token is boundary-exact only when flanked by the string
            # edge or a REAL delimiter: a neighboring escaped literal
            # (e.g. '\\\\' = one backslash, a non-delim) merges with the
            # token in any matching message, changing its var-ness
            left_exact = i == 0 or (
                E.is_delim(query[i - 1]) and query[i - 1] not in _WILDCARDS
            )
            right_exact = j >= n or (
                E.is_delim(query[j]) and query[j] not in _WILDCARDS
            )
            # keep tokens that can never be a variable in any message: no
            # digit, not multi-digit hex, and not '='-preceded-with-alpha
            never_var = (
                left_exact and right_exact
                and not any("0" <= ch <= "9" for ch in tok)
                and not E.could_be_multi_digit_hex_value(tok)
                and not (
                    i > 0 and query[i - 1] == "="
                    and any(ch.isascii() and ch.isalpha() for ch in tok)
                )
            )
            # tokens containing query-level escape backslashes go loose:
            # unescaping them here must mirror wildcard semantics exactly
            # (incl. a trailing '\' escaping the NEXT delimiter) and
            # escape_constant would re-escape — double-escaping pruned
            # true matches. '%' is always sound; only pruning precision
            # is lost, and only for backslash-bearing tokens.
            out.append(tok if never_var and "\\" not in tok else "%")
            i = j
        else:
            if c in "%_":
                out.append("%")
            else:
                # a raw placeholder byte in the query appears ESCAPED in
                # every logtype (encoder.escape_constant) — match that form
                out.append(E.escape_constant(c))
            i += 1
    pat = "".join(out)
    while "%%" in pat:
        pat = pat.replace("%%", "%")
    return "%" + pat + "%" if not pat.startswith("%") else pat + "%"


# from_work_dir memo: engines keyed by (spark app, dir, version signature).
# Insertion-ordered dict, FIFO-bounded at 8 entries. The module itself
# searches from a ThreadPoolExecutor (and catalog search does too), so the
# cache and each engine's mutable per-query state are lock-guarded.
_ENGINE_CACHE: dict[tuple, "GrepEngine"] = {}
_ENGINE_CACHE_LOCK = threading.Lock()


def _work_dir_version(work_dir: str) -> tuple:
    """Change-detection signature of an archive work dir: mtime_ns of every
    table commit marker + the snapshot pointer + sidecar indexes. Any
    pipeline re-run rewrites at least one of these."""
    import os

    parts = []
    for rel in ("_snapshots/_current", "routed/_SUCCESS",
                "logtype_dict/_SUCCESS", "var_dict/_SUCCESS",
                "var_index/_SUCCESS", "range_index.json"):
        p = os.path.join(work_dir, rel)
        try:
            parts.append(os.stat(p).st_mtime_ns)
        except OSError:
            parts.append(None)
    return tuple(parts)


class GrepEngine:
    """Search engine over a routed/enriched events table + its dictionaries.

    Scale contract: the var dictionary is NEVER fully collected. Plan-time
    token probes are filtered point lookups (only matching ids come back to
    the driver), and decode uses a join strategy past a size threshold
    (decode.py). Only the logtype dictionary — small by design, CLP splits
    archives to bound it — is collected for the plan-time LIKE probe.
    """

    def __init__(self, events: DataFrame, logtype_dict: DataFrame,
                 var_dict: DataFrame, decode_mode: str = "auto",
                 var_index: DataFrame | None = None,
                 snapshot=None, snapshot_table: str = "routed",
                 file_stats: list[dict] | None = None,
                 range_index: list[dict] | None = None):
        """``var_index``: optional (var_id, logtype_id) inverted index
        (route.build_var_index) — prunes sinks for queries whose only
        constraints are dictionary variables (Archive.cpp:487-526 /
        Query.cpp:189 analog).

        ``snapshot``: optional :class:`clpspark.snapshots.SnapshotStore`
        whose manifest carries per-file min/max-ts + dict-var bloom stats
        for ``snapshot_table`` — enables manifest-level FILE skipping (the
        Iceberg layer of SURVEY §1.5) before Spark lists or opens footers.

        ``file_stats``: override the manifest's stats with a SUBSET (e.g.
        only the catalog-selected archives of a generation) — ``events``
        must already be restricted to the same subset; pruned reads then
        stay within it."""
        self.events = events
        self.spark = events.sparkSession
        self._lt_df = logtype_dict
        self._vd_df = var_dict
        # driver-side dictionary entries: resolved lazily on the first
        # wildcard probe, and only when the dictionary fits the byte gate
        # (None past the gate -> Spark-side probes)
        self._logtypes: list[tuple[int, str]] | None = None
        self._logtypes_resolved = False
        self._decode_mode = decode_mode
        self._var_map_bc = None
        self._var_index = var_index
        self._snapshot = snapshot
        self._snapshot_table = snapshot_table
        if file_stats is not None:
            self._file_stats = file_stats
        else:
            self._file_stats = (
                snapshot.stats(snapshot_table) if snapshot is not None else []
            )
        # per-row-range metadata KV for $-namespace pruning
        # (clp_s RangeIndexWriter.hpp:17-36; clpspark.range_index)
        self._range_index = range_index
        self._bloom_pos_cache: dict[int, list[int]] = {}
        # engines are shared across threads (memoized handles; catalog
        # searches fan out on a ThreadPoolExecutor): guard the mutable
        # per-query state
        self._state_lock = threading.Lock()
        # observability: file count of the last snapshot-pruned scan on
        # this engine (None = no snapshot / nothing pruned, full table
        # scanned). Under concurrent searches it reflects whichever scan
        # planned last — a progress gauge, not a per-query result.
        self.last_scan_files: int | None = None

    @classmethod
    def from_snapshot(cls, spark, work_dir: str, **kw) -> "GrepEngine":
        """Engine over the CURRENT snapshot of a pipeline work dir: every
        table (events, dictionaries, var index) is read via the manifest's
        exact file list — plus file-level skipping from the stats.

        Consistency contract: the engine's view is the snapshot taken at
        construction. That protects against seeing a HALF-PUBLISHED commit,
        but not against a writer that rewrites table files in place — the
        pipeline's ``mode=overwrite`` re-runs DELETE old part files, so an
        engine built before a re-run errors on its next scan. Rebuild the
        engine after a pipeline re-run (or, at real scale, write fresh
        uniquely-named files per run, which makes old snapshots readable —
        the Iceberg discipline this module mirrors)."""
        from concurrent.futures import ThreadPoolExecutor

        from clpspark.snapshots import SnapshotStore

        store = SnapshotStore(work_dir)
        m = store.manifest()
        if m is None:
            raise FileNotFoundError(f"no snapshot under {work_dir}")
        t = m["tables"]
        # the four table opens are independent driver-side py4j calls
        # (file-index build + footer schema read each) — overlap them;
        # this halves engine construction latency, which is ~half of a
        # cold single-query search
        with ThreadPoolExecutor(4) as ex:
            fr = ex.submit(store.read_table, spark, "routed")
            fl = ex.submit(store.read_table, spark, "logtype_dict")
            fv = ex.submit(store.read_table, spark, "var_dict")
            fi = (ex.submit(store.read_table, spark, "var_index")
                  if "var_index" in t else None)
        return cls(
            fr.result(),
            fl.result(),
            fv.result(),
            var_index=fi.result() if fi is not None else None,
            snapshot=store,
            **kw,
        )

    @classmethod
    def from_work_dir(cls, spark, work_dir: str, **kw) -> "GrepEngine":
        """The one constructor callers should use over a pipeline work dir:
        snapshot-backed when a manifest exists (file skipping + exact file
        lists), plain parquet reads (+ var_index when present) otherwise.

        Construction (4 table opens + logtype collect) is ~half of a cold
        single-query search, so engines are MEMOIZED per (session, dir,
        archive version): repeated CLI/driver calls against an unchanged
        archive reuse the built engine; any pipeline re-run bumps the
        version signature (table _SUCCESS mtimes + snapshot pointer) and
        re-resolves. Only parameterless calls are cached."""
        import os

        key = None
        if not kw:
            sig = _work_dir_version(work_dir)
            key = (spark.sparkContext.applicationId,
                   os.path.abspath(work_dir), sig)
            with _ENGINE_CACHE_LOCK:
                cached = _ENGINE_CACHE.get(key)
            if cached is not None:
                return cached
        eng = cls._from_work_dir_uncached(spark, work_dir, **kw)
        if key is not None:
            with _ENGINE_CACHE_LOCK:
                # racing builders: first insert wins, both get a valid engine
                if key in _ENGINE_CACHE:
                    return _ENGINE_CACHE[key]
                if len(_ENGINE_CACHE) >= 8:  # bound stale-session retention
                    _ENGINE_CACHE.pop(next(iter(_ENGINE_CACHE)))
                _ENGINE_CACHE[key] = eng
        return eng

    @classmethod
    def _from_work_dir_uncached(cls, spark, work_dir: str, **kw) -> "GrepEngine":
        import os

        if "range_index" not in kw:
            from clpspark.range_index import read_range_index

            kw["range_index"] = read_range_index(work_dir)
        if os.path.exists(os.path.join(work_dir, "_snapshots", "_current")):
            return cls.from_snapshot(spark, work_dir, **kw)
        idx = os.path.join(work_dir, "var_index")
        return cls(
            spark.read.parquet(os.path.join(work_dir, "routed")),
            spark.read.parquet(os.path.join(work_dir, "logtype_dict")),
            spark.read.parquet(os.path.join(work_dir, "var_dict")),
            var_index=(
                spark.read.parquet(idx) if os.path.exists(idx) else None
            ),
            **kw,
        )

    def _events_for(
        self,
        tge: int | None,
        tle: int | None,
        dict_hits: list[list[int]] | None,
    ) -> DataFrame:
        """Events scan, file-pruned through the snapshot manifest when
        available. Pure pre-filter: the pruned set is a superset of files
        that can hold matches; row-level predicates still apply."""
        if self._snapshot is None or not self._file_stats:
            self.last_scan_files = None
            return self.events
        from clpspark.snapshots import prune_files

        with self._state_lock:  # prune_files mutates the shared pos cache
            kept = prune_files(
                self.spark, self._file_stats, tge=tge, tle=tle,
                dict_hits=dict_hits or None, pos_cache=self._bloom_pos_cache,
            )
        if len(kept) == len(self._file_stats):
            self.last_scan_files = None
            return self.events
        self.last_scan_files = len(kept)
        return self._snapshot.read_table(
            self.spark, self._snapshot_table,
            files=[s["file"] for s in kept],
        )

    # ------------------------------------------------------------- plan time
    def _probe_var_ids(
        self, tokens: list[str], ignore_case: bool
    ) -> dict[str, list[int]]:
        """One filtered dictionary scan for all query tokens: returns only
        the matching (var_str, var_id) rows — a point lookup, not a collect
        of the dictionary (GrepCore probes its dictionary reader the same
        way, clp/GrepCore.hpp:328-422)."""
        if not tokens:
            return {}
        key = F.lower(F.col("var_str")) if ignore_case else F.col("var_str")
        probes = [t.lower() for t in tokens] if ignore_case else tokens
        rows = (
            self._vd_df.where(key.isin(probes))
            .select(key.alias("k"), "var_id")
            .collect()
        )
        out: dict[str, list[int]] = {t: [] for t in probes}
        for r in rows:
            out[r["k"]].append(r["var_id"])
        if ignore_case:
            return {t: out[t.lower()] for t in tokens}
        return out

    def _var_constraints(self, query: str, ignore_case: bool):
        """Dictionary pre-filter: Column predicates + WontMatch detection.

        Query variables must appear as an IN-ORDER (possibly non-contiguous)
        subsequence of the row's encoded vars — the reference's matches_vars
        semantics (clp/Query.cpp:122-201) — not just unordered membership:
        ordering admits strictly fewer false candidates into the decode UDF.
        """
        ordered: list[list[int]] = []  # acceptable int64s per query var, in order
        pending: list[tuple[int, str]] = []  # (position, dict token)
        for tok, exact in _query_tokens(query):
            if not exact:
                continue
            iv = E.encode_int(tok)
            if iv is not None:
                ordered.append([iv])
                continue
            fv = E.encode_float(tok)
            if fv is not None:
                ordered.append([fv])
                continue
            if not E.is_var(tok):
                continue  # constant token; logtype pattern covers it
            pending.append((len(ordered), tok))
            ordered.append([])  # filled from the dictionary probe below
        hits = self._probe_var_ids([t for _, t in pending], ignore_case)
        dict_hits: list[list[int]] = []
        for pos, tok in pending:
            ids = hits[tok]
            if not ids:
                return None  # WontMatch: required var absent from dictionary
            ordered[pos] = ids
            dict_hits.append(ids)
        if not ordered:
            return [], dict_hits
        if len(ordered) == 1:
            vals = ordered[0]
            if len(vals) == 1:
                return [F.array_contains("encoded_vars", F.lit(vals[0]))], dict_hits
            return [
                F.arrays_overlap(
                    "encoded_vars", F.array(*[F.lit(i) for i in vals])
                )
            ], dict_hits
        return [_ordered_subsequence_pred(ordered)], dict_hits

    def _index_logtype_ids(self, dict_hits: list[list[int]]) -> set[int] | None:
        """Sinks that can satisfy EVERY dict-var constraint, per the
        (var_id, logtype_id) inverted index. None = index unavailable or no
        dict constraints (no pruning signal)."""
        if self._var_index is None or not dict_hits:
            return None
        all_ids = sorted({i for ids in dict_hits for i in ids})
        rows = (
            self._var_index.where(F.col("var_id").isin(all_ids))
            .select("var_id", "logtype_id")
            .collect()
        )
        by_var: dict[int, set[int]] = {}
        for r in rows:
            by_var.setdefault(r["var_id"], set()).add(r["logtype_id"])
        result: set[int] | None = None
        for ids in dict_hits:
            lts: set[int] = set()
            for i in ids:
                lts |= by_var.get(i, set())
            result = lts if result is None else (result & lts)
            if not result:
                return set()
        return result

    def _logtype_entries(self) -> list[tuple[int, str]] | None:
        """Driver-side (logtype_id, logtype) list when the dictionary fits
        the entry/byte gate, else None (probes stay Spark-side). One
        limit-bounded collect resolves both gates — never an unbounded
        collect of an oversized dictionary."""
        with self._state_lock:
            if self._logtypes_resolved:
                return self._logtypes
        # collect OUTSIDE the lock: prewarm overlaps this job with the
        # decode resolution on another thread (racing builders are rare
        # and both produce the same value; first publisher wins)
        rows = (
            self._lt_df.select("logtype_id", "logtype")
            .limit(LOGTYPE_COLLECT_MAX_ENTRIES + 1)
            .collect()
        )
        small = len(rows) <= LOGTYPE_COLLECT_MAX_ENTRIES and (
            sum(len(r["logtype"]) for r in rows)
            <= LOGTYPE_COLLECT_MAX_BYTES
        )
        val = (
            [(r["logtype_id"], r["logtype"]) for r in rows]
            if small else None
        )
        with self._state_lock:
            if not self._logtypes_resolved:
                self._logtypes = val
                self._logtypes_resolved = True
            return self._logtypes

    def _candidate_logtype_ids(
        self, query: str, ignore_case: bool
    ) -> list[int] | None:
        """Sink ids whose logtype can match the query's pattern; None = no
        pruning signal (all-wildcard pattern, or a large-dictionary probe
        matching too many ids to be worth an isin)."""
        pat = _logtype_like_pattern(query)
        if ignore_case:
            pat = pat.lower()
        if pat.strip("%") == "":
            return None  # matches every logtype: isin(everything) is noise
        entries = self._logtype_entries()
        if entries is not None:
            like = _sql_like_match(pat)
            out = []
            for lid, lt in entries:
                hay = lt.lower() if ignore_case else lt
                if like(hay):
                    out.append(lid)
            return out
        # large dictionary: filtered Spark scan — the reference's in-memory
        # dictionary wildcard scan, without driver residency. Only matching
        # ids return; an over-wide match degrades to "unconstrained".
        key = F.lower(F.col("logtype")) if ignore_case else F.col("logtype")
        rows = (
            self._lt_df.where(key.rlike(_like_to_java_regex(pat)))
            .select("logtype_id")
            .limit(LOGTYPE_PROBE_MAX_IDS + 1)
            .collect()
        )
        if len(rows) > LOGTYPE_PROBE_MAX_IDS:
            return None
        return [r["logtype_id"] for r in rows]

    # -------------------------------------------------------------- execution
    def search(
        self,
        query: str,
        ignore_case: bool = False,
        tge: int | None = None,
        tle: int | None = None,
        limit: int | None = None,
        prefilter: bool = True,
        source: str | None = None,
        meta: dict[str, str] | None = None,
    ) -> DataFrame:
        """Rows matching the wildcard query; returns events + decoded message.

        ``source`` mirrors the reference's --file-path restriction
        (clp/clo/clo.cpp, fs_search_task.py:45-48).

        ``meta``: $-namespace metadata filters ({key: wildcard pattern})
        evaluated against the archive's range index on the driver
        (clp_s/search/EvaluateRangeIndexFilters.cpp analog); matching
        ranges become doc_id BETWEEN predicates pushed into the scan, a
        query matching no range short-circuits to lit(False)."""
        q = clean_up_wildcard_search_string(query)
        constraints = (
            self._var_constraints(q, ignore_case)
            if (prefilter and q != "*")
            else ([], [])
        )
        df = self._events_for(
            tge, tle, constraints[1] if constraints else None
        )
        if meta is not None:
            from clpspark.range_index import match_ranges, range_predicate

            matched = match_ranges(
                self._range_index, meta, case_sensitive=not ignore_case
            )
            df = df.where(range_predicate(matched))
        if source is not None:
            df = df.where(F.col("source") == F.lit(source))
        if tge is not None:
            df = df.where(F.col("ts") >= F.lit(tge))
        if tle is not None:
            df = df.where(F.col("ts") <= F.lit(tle))
        if q == "*":
            out = self._decode(df)
            return out.limit(limit) if limit else out
        if prefilter:
            if constraints is None:
                return self._decode(df.where(F.lit(False)))
            preds, dict_hits = constraints
            lids = self._candidate_logtype_ids(q, ignore_case)
            # all-dict-var queries have an all-wildcard logtype pattern
            # (lids = None, unconstrained); the inverted index narrows them
            # to sinks that actually co-contain every required dict var
            idx_lids = self._index_logtype_ids(dict_hits)
            if idx_lids is not None:
                lids = (sorted(idx_lids) if lids is None
                        else [lid for lid in lids if lid in idx_lids])
            # the quarantine sink (streaming rows whose logtype was absent
            # from the fixed dictionary, route.UNKNOWN_LOGTYPE_ID) can't be
            # probed at plan time — its logtype strings aren't in the dict —
            # so it is ALWAYS a candidate, even when a var_index omits it
            # (an index snapshot taken before later quarantined batches
            # would otherwise turn the prefilter into a row-dropping
            # filter). Partition pruning makes the extra id free when the
            # sink doesn't exist; prefiltered search stays a pure superset.
            if lids is not None:
                from clpspark.operators.route import UNKNOWN_LOGTYPE_ID

                if UNKNOWN_LOGTYPE_ID not in lids:
                    lids = [*lids, UNKNOWN_LOGTYPE_ID]
                df = df.where(F.col("logtype_id").isin(lids))
            for p in preds:
                df = df.where(p)
        out = self._final_match(self._decode(df), q, ignore_case)
        return out.limit(limit) if limit else out

    def search_regex(self, regex: str, ignore_case: bool = False,
                     **kw) -> DataFrame:
        """Regex front-end: translate to a wildcard query when expressible
        (clp/regex_utils/regex_translation_utils.cpp) so the dictionary
        pre-filters apply; untranslatable regexes fall back to a decode +
        rlike full scan (still partition-pruned by any ts/source filters)."""
        from clpspark.ref.regex_translate import (
            RegexTranslationError,
            regex_to_wildcard,
        )

        try:
            wild = regex_to_wildcard(
                regex, case_insensitive=ignore_case,
                add_prefix_suffix_wildcards=True,
            )
        except RegexTranslationError:
            tge, tle = kw.pop("tge", None), kw.pop("tle", None)
            df = self._events_for(tge, tle, None)
            meta = kw.pop("meta", None)
            if meta is not None:
                from clpspark.range_index import match_ranges, range_predicate

                df = df.where(range_predicate(match_ranges(
                    self._range_index, meta,
                    case_sensitive=not ignore_case,
                )))
            for col, val in (("source", kw.pop("source", None)),):
                if val is not None:
                    df = df.where(F.col(col) == F.lit(val))
            if tge is not None:
                df = df.where(F.col("ts") >= F.lit(tge))
            if tle is not None:
                df = df.where(F.col("ts") <= F.lit(tle))
            limit = kw.pop("limit", None)
            pat = f"(?i){regex}" if ignore_case else regex
            out = self._decode(df).where(F.col("message").rlike(pat))
            return out.limit(limit) if limit else out
        return self.search(wild, ignore_case=ignore_case, **kw)

    def count(self, query: str, **kw) -> DataFrame:
        return self.search(query, **kw).agg(F.count("*").alias("n_rows"))

    def count_by_time(self, query: str, bucket_ms: int, **kw) -> DataFrame:
        matched = self.search(query, **kw)
        bucket = (F.floor(F.col("ts") / bucket_ms) * bucket_ms).alias("bucket")
        return (
            matched.where(F.col("ts").isNotNull())
            .groupBy(bucket)
            .agg(F.count("*").alias("n_rows"))
        )

    def topk_latest(self, query: str, k: int, **kw) -> DataFrame:
        return (
            self.search(query, **kw)
            .orderBy(F.col("ts").desc(), F.col("doc_id"))
            .limit(k)
        )

    def topk_latest_windowed(
        self, query: str, k: int, window_ms: int = 3_600_000, **kw
    ) -> DataFrame:
        """Top-k latest with newest-first early exit.

        The reference walks archives newest-first and stops once its heap
        holds k results newer than any remaining archive
        (clp/clo/OutputHandler.hpp:188-201, query_scheduler.py:863). Spark
        analog: probe the newest matching window first and widen backwards
        (x4) only while it holds fewer than k matches — each probe is a
        ts-range predicate that prunes at the parquet row-group/stats layer,
        so the common case decodes a sliver of the data instead of
        everything. Results are identical to :meth:`topk_latest`.
        """
        # caller-supplied time bounds intersect the probe window (forwarding
        # them verbatim would duplicate the tge/tle keywords in search())
        caller_tge = kw.pop("tge", None)
        caller_tle = kw.pop("tle", None)
        bounds = self.events.agg(
            F.max("ts").alias("hi"), F.min("ts").alias("lo")
        ).first()
        hi, lo = bounds["hi"], bounds["lo"]
        if hi is None:
            return self.topk_latest(query, k, tge=caller_tge, tle=caller_tle,
                                    **kw)
        if caller_tle is not None:
            hi = min(hi, caller_tle)
        if caller_tge is not None:
            lo = max(lo, caller_tge)
        delta = window_ms
        while True:
            tge = hi - delta + 1
            out = self.search(query, tge=max(tge, lo), tle=hi, **kw)
            if tge <= lo or out.limit(k).count() >= k:
                return (
                    out.orderBy(F.col("ts").desc(), F.col("doc_id")).limit(k)
                )
            delta *= 4

    def _decode(self, df: DataFrame) -> DataFrame:
        """Reconstruct messages of (pre-filtered) survivors.

        Delegates to decode.decode_messages: broadcast-map decode while the
        var dictionary is small, join decode (no driver collect) beyond —
        and a broadcast join for the logtype string, which routed sinks no
        longer carry (ids only, like CLP archives)."""
        from clpspark.operators.decode import decode_messages

        self._resolve_decode()
        return decode_messages(
            df,
            self._vd_df,
            logtype_dict=self._lt_df,
            mode=self._decode_mode,
            var_map_bc=self._var_map_bc,
        )

    def _resolve_decode(self) -> None:
        """Resolve the decode strategy (+ var-map broadcast) once; also
        called by JsonArchive.prewarm to overlap this job with the other
        cold dictionary probes."""
        from clpspark.operators.decode import (
            build_var_map_broadcast,
            resolve_decode_and_map,
        )

        def _unresolved() -> bool:
            return self._decode_mode == "auto" or (
                self._decode_mode == "map" and self._var_map_bc is None
            )

        with self._state_lock:
            if not _unresolved():
                return
            mode = self._decode_mode
        # the Spark job runs OUTSIDE the lock (prewarm overlaps it with
        # the logtype collect); first publisher wins
        if mode == "auto":
            new_mode, bc = resolve_decode_and_map(self._vd_df)
        else:
            new_mode, bc = "map", build_var_map_broadcast(self._vd_df)
        with self._state_lock:
            if _unresolved():
                self._decode_mode, self._var_map_bc = new_mode, bc

    @staticmethod
    def _final_match(decoded: DataFrame, q: str, ignore_case: bool) -> DataFrame:
        col = F.col("message")
        pat = q
        if ignore_case:
            col = F.lower(col)
            pat = q.lower()
        like = wildcard_to_like(pat)
        if like is not None:
            return decoded.where(col.like(like))
        from clpspark.ref.wildcard import wildcard_to_java_regex

        return decoded.where(col.rlike(wildcard_to_java_regex(pat)))


def _ordered_subsequence_pred(ordered: list[list[int]]):
    """encoded_vars contains one acceptable value per query var, in query
    order (ordered subsequence; clp/Query.cpp matches_vars). A single
    aggregate() fold over the tiny per-row array — JVM-side, no shuffle."""
    n = len(ordered)
    branches = " ".join(
        f"WHEN acc = {i} AND v IN ({', '.join(str(v) + 'L' for v in vals)}) "
        f"THEN {i + 1}"
        for i, vals in enumerate(ordered)
    )
    return F.expr(
        f"aggregate(encoded_vars, 0, (acc, v) -> CASE {branches} ELSE acc END)"
        f" = {n}"
    )


def _like_to_java_regex(pattern: str) -> str:
    """%-pattern -> Java regex for a Spark-side rlike probe. Literal runs
    are \\Q-quoted (raw placeholder/control bytes in logtypes stay
    literal); only '%' is a wildcard, same semantics as _sql_like_match."""
    parts = pattern.split("%")
    quoted = [
        "\\Q" + p.replace("\\E", "\\E\\\\E\\Q") + "\\E" if p else ""
        for p in parts
    ]
    return "^" + "(?s:.*)".join(quoted) + "$"


def _sql_like_match(pattern: str):
    """Compile a %-pattern into a Python matcher (driver-side dict probe)."""
    import re as _re

    rx = _re.compile(
        "^" + "".join(
            "(?s:.*)" if c == "%" else _re.escape(c) for c in pattern
        ) + "$"
    )
    return lambda s: rx.match(s) is not None


def _spark_type(df: DataFrame, col: str) -> str:
    return df.schema[col].dataType.simpleString()
