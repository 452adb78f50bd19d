"""HTTP(S) input source (clp NetworkReader / CurlDownloadHandler analog).

The reference streams remote inputs through libcurl with auth headers
and offset-resume via the Range header — ``Range: bytes=<offset>-`` on
retry (clp/CurlDownloadHandler.cpp:61-71), plus S3 via signed URLs
(clp/aws/). Spark has no http:// filesystem, so the same shape here is
fetch-to-staging: download (with auth, retries that RESUME from the
bytes already on disk when the server honors ranges) into a local/shared
staging directory, then hand the file to the existing sources
(text_logs / json_logs / archives / ir_stream). On a real cluster the
staging dir is shared storage and the fetch is one task per URL via
``fetch_many``; S3 proper stays ``spark.read`` over ``s3a://`` (Hadoop
FS handles auth/ranges natively — no code needed here).
"""

from __future__ import annotations

import hashlib
import http.client
import os
import time
import urllib.error
import urllib.request

DEFAULT_STAGING = "/dev/shm/clpspark_http_staging"

# transient by convention: request timeout / rate limit — retry these
# even though they are 4xx (the reference's curl handler retries them too)
_RETRYABLE_4XX = {408, 429}


def fetch_url(
    url: str,
    dest: str | None = None,
    staging_dir: str = DEFAULT_STAGING,
    headers: dict[str, str] | None = None,
    timeout: float = 30.0,
    retries: int = 3,
    retry_wait: float = 0.2,
    chunk_size: int = 1 << 20,
) -> str:
    """Download ``url`` to ``dest`` (default: staging dir, name derived
    from the URL); returns the local path.

    Retries resume from the current partial length with
    ``Range: bytes=<n>-`` when the server answers 206; a 200 re-sends
    the whole body and the partial file is truncated (the reference's
    CurlDownloadHandler does exactly this offset dance). Resumes are
    guarded with ``If-Range: <ETag|Last-Modified>`` from the first
    response — a changed resource then answers 200 and the stale partial
    is discarded; with no validator the retry restarts from offset 0
    rather than risk splicing two versions.
    """
    if dest is None:
        os.makedirs(staging_dir, exist_ok=True)
        # distinct URLs sharing a basename (dated dirs, query strings)
        # must not collide in staging — key the name on the full URL
        base = url.rstrip("/").rsplit("/", 1)[-1].split("?", 1)[0] \
            or "download"
        tag = hashlib.sha256(url.encode()).hexdigest()[:12]
        dest = os.path.join(staging_dir, f"{tag}-{base}")
    tmp = dest + ".part"
    if os.path.exists(tmp):
        os.remove(tmp)
    last_err: Exception | None = None
    validator: str | None = None  # ETag/Last-Modified of the partial
    for attempt in range(retries):
        offset = os.path.getsize(tmp) if os.path.exists(tmp) else 0
        if offset and validator is None:
            # no validator from the first response: a resumed 206 could
            # splice bytes of a CHANGED resource onto the old partial —
            # restart from zero instead
            os.remove(tmp)
            offset = 0
        req_headers = dict(headers or {})
        if offset:
            req_headers["Range"] = f"bytes={offset}-"
            req_headers["If-Range"] = validator
        req = urllib.request.Request(url, headers=req_headers)
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                resumed = offset and resp.status == 206
                if not resumed:
                    # (re)starting from byte 0 — whatever lands on disk
                    # now belongs to THIS response's version, so the
                    # validator must refresh (a stale one would force
                    # every later resume back to offset 0)
                    validator = (resp.headers.get("ETag")
                                 or resp.headers.get("Last-Modified"))
                mode = "ab" if resumed else "wb"
                want = resp.headers.get("Content-Length")
                got = 0
                with open(tmp, mode) as f:
                    while True:
                        chunk = resp.read(chunk_size)
                        if not chunk:
                            break
                        got += len(chunk)
                        f.write(chunk)
                # read(amt) returns b"" on an early server close instead
                # of raising — verify the advertised length ourselves or
                # a truncated body would publish as complete
                if want is not None and got < int(want):
                    raise http.client.IncompleteRead(
                        b"", int(want) - got)
            os.replace(tmp, dest)
            return dest
        except urllib.error.HTTPError as e:
            # 416: our offset is past EOF — the previous pass actually
            # finished; anything else 4xx is not retryable
            if e.code == 416 and offset:
                os.replace(tmp, dest)
                return dest
            if 400 <= e.code < 500 and e.code not in _RETRYABLE_4XX:
                raise
            last_err = e
        except (urllib.error.URLError, TimeoutError, OSError,
                http.client.HTTPException) as e:
            # HTTPException covers IncompleteRead — a truncated body is
            # THE case the Range-resume retry exists for
            last_err = e
        time.sleep(retry_wait * (2 ** attempt))
    raise IOError(f"failed to fetch {url} after {retries} tries: {last_err}")


def fetch_many(
    spark,
    urls: list[str],
    staging_dir: str = DEFAULT_STAGING,
    headers: dict[str, str] | None = None,
    **kw,
) -> list[str]:
    """Fetch a URL list in parallel, one Spark task per URL (the scale
    path: a 1000-executor cluster downloads 1000 files at once into
    shared staging). Local paths come back in input order."""
    n = max(1, len(urls))
    sc = spark.sparkContext

    def _fetch(iu):
        i, u = iu
        return i, fetch_url(u, staging_dir=staging_dir, headers=headers,
                            **kw)

    got = (
        sc.parallelize(list(enumerate(urls)), n)
        .map(_fetch)
        .collect()
    )
    return [p for _i, p in sorted(got)]
