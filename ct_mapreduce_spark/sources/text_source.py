"""Text-corpus sources: JSONL, gzipped JSONL, and WARC.

Real training corpora do not arrive as parquet: web-scale text ships as
JSONL (one document object per line), usually gzip-compressed, or as
WARC archives (Common Crawl's format). This module reads all three with
public primitives only:

- plain JSONL: Spark's native json reader (splittable, predicate-pushdown
  capable — the fast path when the data is uncompressed or zstd/bzip2
  splittable).
- .jsonl.gz: gzip is NOT splittable, so one file = one task no matter
  what; the honest 100 TB posture is many medium files (Common Crawl
  ships ~1 GB segments for exactly this reason). Implemented over
  binaryFile + stdlib gzip inside mapInPandas — no codec configuration
  dependence, and decode failures isolate per file.
- WARC/1.0: a dependency-free record parser (the RFC's framing:
  version line, CRLF header block, Content-Length octets, CRLF CRLF
  separator) over binaryFile bytes, iterative — no recursion, garbage
  tolerated per record. Same philosophy as the BMP/WAV/AVI codecs in
  operators/multimodal.py: the container format is public and simple
  enough that a real parser beats a stub.

Reference anchor: the reference ingests exactly one wire format (CT
get-entries JSON, sources/ctlog_source.py); these are the engine's
corpus-side equivalents.
"""

from __future__ import annotations

import gzip
import io
import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string, lang string"


def read_jsonl(spark: SparkSession, path: str, schema: str = DOC_SCHEMA) -> DataFrame:
    """Plain/splittable JSONL: the native reader with an EXPLICIT schema
    (schema inference is a full extra pass over 100 TB — never rely on
    it) and per-record corruption tolerance (bad lines become nulls in
    _corrupt_record instead of failing the task)."""
    return (
        spark.read.schema(schema + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


# Bounded-memory decode: emit an Arrow batch whenever this many records
# (or this many accumulated payload bytes) are pending — per-task memory
# is O(chunk + one record), never O(inflated archive). A ~1 GB Common
# Crawl gzip segment inflates to ~4-5 GB; before r7 both .gz decoders
# materialized that in one shot on one executor core.
_DECODE_CHUNK_ROWS = 4096
_DECODE_CHUNK_BYTES = 32 << 20


def read_jsonl_gz(
    spark: SparkSession, path: str, schema: str = DOC_SCHEMA
) -> DataFrame:
    """Gzipped JSONL via binaryFile + stdlib gzip. One file = one task
    (gzip is not splittable); parallelism = file count, which is how
    web-scale corpora are already laid out. Decompression is STREAMED
    (gzip.GzipFile over the compressed bytes, line at a time) and rows
    are yielded in bounded chunks — per-task memory is O(chunk), not
    O(inflated file). Bad JSON lines are skipped per line; a corrupt
    gzip stream drops that file's remaining rows only (lines decoded
    before the corruption point are kept)."""
    files = spark.read.format("binaryFile").load(path)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "text", "lang"]
        rows: list[tuple] = []
        pending = 0
        for pdf in batches:
            for content in pdf["content"]:
                stream = io.TextIOWrapper(
                    gzip.GzipFile(fileobj=io.BytesIO(bytes(content))),
                    encoding="utf-8",
                    errors="replace",
                )
                try:
                    for line in stream:
                        if not line.strip():
                            continue
                        try:
                            obj = json.loads(line)
                        except Exception:
                            continue
                        rows.append(
                            (obj.get("doc_id"), obj.get("text"), obj.get("lang"))
                        )
                        pending += len(line)
                        if (
                            len(rows) >= _DECODE_CHUNK_ROWS
                            or pending >= _DECODE_CHUNK_BYTES
                        ):
                            yield pd.DataFrame(rows, columns=cols)
                            rows, pending = [], 0
                except Exception:  # corrupt gzip member: drop its remainder
                    pass
        yield pd.DataFrame(rows, columns=cols)

    return files.select("content").mapInPandas(_decode, schema)


# --- WARC ---------------------------------------------------------------


def iter_warc_records(buf) -> Iterator[dict]:
    """Iterative WARC/1.0 record walk over any binary file-like object
    (BytesIO for plain archives, gzip.GzipFile for streamed .gz
    decompression — the reader never materializes the inflated archive;
    memory is O(one record), asserted under tracemalloc in
    tests/test_text_source.py). No recursion; garbage-tolerant — a
    malformed record (or a mid-stream decompression error, surfaced by
    readline) ends that FILE's remainder but keeps records already
    yielded. Yields dicts with the headers the curation pipeline keys on
    plus the raw payload bytes."""
    while True:
        version = buf.readline()
        if not version:
            break
        if not version.strip():  # inter-record CRLF padding
            continue
        if not version.startswith(b"WARC/"):
            break
        headers: dict[str, str] = {}
        while True:
            line = buf.readline()
            if not line or line in (b"\r\n", b"\n"):
                break
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body = buf.read(length)
        if len(body) != length:
            break
        yield {
            "warc_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri", ""),
            "date": headers.get("warc-date", ""),
            "record_id": headers.get("warc-record-id", ""),
            "content_type": headers.get("content-type", ""),
            "length": length,
            "body": body,
        }


def parse_warc_records(payload: bytes) -> list[dict]:
    """Eager list form of iter_warc_records over in-memory bytes (kept
    for tests/small payloads; the Spark read path streams instead)."""
    out: list[dict] = []
    try:
        out.extend(iter_warc_records(io.BytesIO(payload)))
    except Exception:
        pass
    return out


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC archives -> one row per record. binaryFile + the iterative
    parser in mapInPandas; `response` records carry page payloads, the
    text tier downstream strips HTTP headers/HTML as needed. Parallelism
    = archive count (Common Crawl: ~1 GB each, tens of thousands per
    crawl — exactly the sizing a 1000-executor cluster wants).

    Memory posture (r7): .gz archives are decompressed as a STREAM
    (gzip.GzipFile record iteration, never gzip.decompress of the whole
    archive) and parsed rows leave in bounded chunks — per-task memory
    is O(compressed bytes held by binaryFile + one decode chunk), not
    O(inflated archive); a ~1 GB crawl segment no longer spikes ~4-5 GB
    per core. A mid-archive gzip corruption keeps the records already
    emitted and drops that archive's remainder."""

    cols = [
        "archive",
        "warc_type",
        "url",
        "date",
        "record_id",
        "content_type",
        "length",
        "body",
    ]

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: list[tuple] = []
        pending = 0
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                raw = io.BytesIO(bytes(content))
                stream = (
                    gzip.GzipFile(fileobj=raw) if fpath.endswith(".gz") else raw
                )
                try:
                    for rec in iter_warc_records(stream):
                        rows.append(
                            (
                                fpath,
                                rec["warc_type"],
                                rec["url"],
                                rec["date"],
                                rec["record_id"],
                                rec["content_type"],
                                rec["length"],
                                rec["body"].decode("utf-8", errors="replace"),
                            )
                        )
                        pending += rec["length"]
                        if (
                            len(rows) >= _DECODE_CHUNK_ROWS
                            or pending >= _DECODE_CHUNK_BYTES
                        ):
                            yield pd.DataFrame(rows, columns=cols)
                            rows, pending = [], 0
                except Exception:  # corrupt member: drop its remainder
                    pass
        yield pd.DataFrame(rows, columns=cols)

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(
            _parse,
            "archive string, warc_type string, url string, date string, "
            "record_id string, content_type string, length long, body string",
        )
    )


def synthetic_warc_fixture(path: str, n: int = 64) -> None:
    """Deterministic WARC fixture: n records across two archives (one
    plain, one gzipped — both read paths exercised). Record i: a fixed
    URL/date/id, text/plain body = a seeded sentence repeated (i%7)+1
    times; every fifth record is a `request` (non-response) record so
    type filtering is visible. Pure function of n — the golden-pin
    oracle (tools/independent_oracle.py) regenerates the records
    independently and derives the expected rows WITHOUT running this
    module's parser, so the pin proves the encode->parse round trip."""
    import os

    recs = [
        {
            "warc_type": "request" if i % 5 == 0 else "response",
            "url": f"https://corpus.example/doc/{i}",
            "date": "2026-01-01T00:00:00Z",
            "record_id": f"<urn:uuid:{i:08d}>",
            "content_type": "text/plain",
            "body": f"synthetic corpus sentence {i * 37 % 101}. " * ((i % 7) + 1),
        }
        for i in range(n)
    ]
    os.makedirs(path, exist_ok=True)
    half = n // 2
    with open(os.path.join(path, "seg-000.warc"), "wb") as f:
        f.write(encode_warc(recs[:half]))
    with open(os.path.join(path, "seg-001.warc.gz"), "wb") as f:
        f.write(gzip.compress(encode_warc(recs[half:])))


def synthetic_warc_multidomain_fixture(path: str, n: int = 60) -> None:
    """Domain-analytics WARC fixture: response records spread across
    five registered domains x three subdomains, plus every fourth
    record a `request` so type filtering stays visible. The five
    suffixes deliberately include multi-label public suffixes (co.uk,
    github.io, com.au) so the pins lock in PSL semantics — under the
    old last-two-labels rule `blog.co.uk` would mis-group as `co.uk`
    (the r9 verdict's day-one UK/AU-crawl failure). Pure function of
    n — the golden-pin oracle (tools/independent_oracle.py:
    s16_warc_domain_stats) regenerates the records independently with
    its own inline PSL matcher, so the pin proves the
    encode->parse->PSL-lookup->rollup composition."""
    import os

    doms = ["news", "blog", "shop", "docs", "wiki"]
    sufs = ["example", "co.uk", "github.io", "com.au", "example"]
    subs = ["www", "m", "api"]
    recs = [
        {
            "warc_type": "request" if i % 4 == 0 else "response",
            "url": (
                f"https://{subs[i % 3]}.{doms[i % 5]}.{sufs[i % 5]}/p/{i}"
            ),
            "date": "2026-01-01T00:00:00Z",
            "record_id": f"<urn:uuid:{i + 1000:08d}>",
            "content_type": "text/plain",
            "body": (
                f"page text for {doms[i % 5]} item {i * 13 % 17} "
                * ((i % 6) + 2)
            ),
        }
        for i in range(n)
    ]
    os.makedirs(path, exist_ok=True)
    half = n // 2
    with open(os.path.join(path, "seg-000.warc"), "wb") as f:
        f.write(encode_warc(recs[:half]))
    with open(os.path.join(path, "seg-001.warc.gz"), "wb") as f:
        f.write(gzip.compress(encode_warc(recs[half:])))


def write_jsonl_gz(
    df: DataFrame, path: str, n_shards: int | None = None
) -> None:
    """Export a documents frame as gzipped JSONL — the format tokenizer
    pipelines consume and the inverse of read_jsonl_gz (round trip
    tested). Uses the native json writer with gzip codec (JVM-side
    serialization, one file per partition); pass n_shards to repartition
    first so shard count — and thus the DOWNSTREAM reader's parallelism,
    since gzip is unsplittable — is chosen deliberately instead of
    inherited from the upstream plan."""
    if n_shards is not None:
        df = df.repartition(n_shards)
    df.write.mode("overwrite").option("compression", "gzip").json(path)


def synthetic_html_body(i: int) -> str:
    """Record i's HTTP-response-plus-HTML payload (pure function of i;
    the pin oracle replays the same template). Exercises script/style/
    comment stripping, entity decoding, and tag soup."""
    paras = "".join(
        f"<p>paragraph {j} of doc {i} &amp; more</p>" for j in range((i % 5) + 1)
    )
    html = (
        f"<html><head><title>Doc {i}</title>"
        f"<style>p {{color: #{i:06d}}}</style>"
        f"<script>var x = {i}; if (x < 99) {{ x += 1; }}</script>"
        f"</head><body><h1>Title &lt;{i}&gt;</h1>{paras}"
        f"<!-- hidden comment {i} -->&quot;quoted&quot;&#39;s</body></html>"
    )
    return (
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        f"Content-Length: {len(html)}\r\n\r\n" + html
    )


def synthetic_warc_html_fixture(path: str, n: int = 32) -> None:
    """HTML-crawl WARC fixture: response records whose bodies carry HTTP
    headers + templated HTML (synthetic_html_body); one plain and one
    gzipped archive, like synthetic_warc_fixture."""
    import os

    recs = [
        {
            "warc_type": "response",
            "url": f"https://crawl.example/page/{i}",
            "date": "2026-01-01T00:00:00Z",
            "record_id": f"<urn:uuid:h{i:07d}>",
            "content_type": "application/http; msgtype=response",
            "body": synthetic_html_body(i),
        }
        for i in range(n)
    ]
    os.makedirs(path, exist_ok=True)
    half = n // 2
    with open(os.path.join(path, "seg-000.warc"), "wb") as f:
        f.write(encode_warc(recs[:half]))
    with open(os.path.join(path, "seg-001.warc.gz"), "wb") as f:
        f.write(gzip.compress(encode_warc(recs[half:])))


def encode_warc(records: list[dict]) -> bytes:
    """Minimal WARC/1.0 writer (the test/fixture half of the round trip):
    each record = version line, headers, Content-Length, CRLF CRLF, body,
    CRLF CRLF."""
    out = io.BytesIO()
    for rec in records:
        body = rec["body"] if isinstance(rec["body"], bytes) else rec["body"].encode()
        out.write(b"WARC/1.0\r\n")
        out.write(f"WARC-Type: {rec.get('warc_type', 'response')}\r\n".encode())
        if rec.get("url"):
            out.write(f"WARC-Target-URI: {rec['url']}\r\n".encode())
        if rec.get("date"):
            out.write(f"WARC-Date: {rec['date']}\r\n".encode())
        if rec.get("record_id"):
            out.write(f"WARC-Record-ID: {rec['record_id']}\r\n".encode())
        out.write(
            f"Content-Type: {rec.get('content_type', 'text/plain')}\r\n".encode()
        )
        out.write(f"Content-Length: {len(body)}\r\n".encode())
        out.write(b"\r\n")
        out.write(body)
        out.write(b"\r\n\r\n")
    return out.getvalue()
