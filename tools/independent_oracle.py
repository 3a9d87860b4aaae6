"""Independent re-derivations of the golden-pinned queries.

Each function recomputes a pinned query's full result OUTSIDE Spark —
pyarrow to read the parquet, numpy/hashlib/stdlib for the math, and
tools/xxh64.py (an independent pure-Python implementation of the public
XXH64 algorithm) where the engine plan uses `F.xxhash64`. tools/
pin_golden.py asserts bit-equality between the engine result and these
derivations before writing a pin, so a bug in the engine's query
composition (banding, joins, ranking, aggregation) cannot self-certify
through a pin.

Two deliberate shared dependencies, both inputs rather than computations:
- `np.random.default_rng(seed)` / `random.Random(seed).gauss` parameter
  draws (hash-family coefficients, hyperplanes, fixture payloads) — these
  are the operator's *parameters*; both sides must agree on them by
  definition.
- the (batch x dim) @ (dim x n_bits) float64 matmul that produces LSH
  sign bits — sign(dot) near zero depends on accumulation order, and the
  engine's order is numpy's; an independently-ordered fold could
  legitimately flip a bucket bit. Everything downstream of the bits
  (banding, bucket joins, candidate generation, exact re-rank) is
  re-derived from scratch.

Float folds elsewhere reproduce the engine's *declared* fold order
(F.aggregate's left fold, index order) rather than calling numpy sums,
and decimal rounding reproduces Spark's ROUND_HALF_UP on the shortest
decimal representation (= java BigDecimal.valueOf semantics).
"""

from __future__ import annotations

import hashlib
import re
import sys
from decimal import ROUND_HALF_UP, Decimal
from pathlib import Path

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent))

from xxh64 import Int32, spark_xxhash64

# Java regex \s (ASCII-only, unlike Python's unicode-aware \s)
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _round6(x: float) -> float:
    """Spark F.round(col, 6) on DOUBLE: HALF_UP at scale 6 over the
    shortest decimal representation of the double."""
    return float(
        Decimal(repr(float(x))).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def _tokens(text: str) -> list[str]:
    """F.split(F.trim(text), r'\\s+') — trim strips ASCII spaces only;
    Java split with limit -1 keeps leading/trailing empty fields."""
    return _JAVA_WS.split(text.strip(" "))


def _shingles(text: str, k: int = 3) -> list[str]:
    toks = _tokens(text)
    if len(toks) < k:
        return []
    seen, out = set(), []
    for i in range(len(toks) - k + 1):
        s = " ".join(toks[i : i + k])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def _fold_dot(a: np.ndarray, b: np.ndarray) -> float:
    """F.aggregate(zip_with(a, b, x*y), 0.0, +) — strict left fold in
    index order, every operand cast float->double first."""
    acc = 0.0
    for x, y in zip(a.astype(np.float64), b.astype(np.float64)):
        acc += float(x) * float(y)
    return acc


def _fold_norm(a: np.ndarray) -> float:
    acc = 0.0
    for x in a.astype(np.float64):
        acc += float(x) * float(x)
    return float(np.sqrt(acc))


def _cosine(a: np.ndarray, b: np.ndarray) -> float:
    return _fold_dot(a, b) / (_fold_norm(a) * _fold_norm(b))


def _read(sf_dir: str, table: str):
    return pq.read_table(f"{sf_dir}/{table}.parquet")


# ---------------------------------------------------------------------------
# documents: MinHash + banded LSH
# ---------------------------------------------------------------------------


def _minhash_sigs(
    sf_dir: str, k: int, num_hashes: int, seed: int
) -> dict[int, np.ndarray]:
    """doc_id -> signature vector, the shared first stage of the MinHash
    family (same affine family over xxhash64 base hashes as
    operators/dedup_fuzzy.py:minhash_signatures)."""
    t = _read(sf_dir, "documents")
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()

    p = np.uint64((1 << 61) - 1)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=num_hashes, dtype=np.uint64)

    sigs: dict[int, np.ndarray] = {}
    for doc_id, text in zip(doc_ids, texts):
        sh = _shingles(text, k)
        if not sh:
            sigs[doc_id] = np.zeros(num_hashes, dtype=np.int64)
            continue
        base = np.array(
            [spark_xxhash64(s, Int32(seed)) for s in sh], dtype=np.int64
        )
        x = base.view(np.uint64) & p
        with np.errstate(over="ignore"):
            v = (a[:, None] * x[None, :] + b[:, None]) % p
        sigs[doc_id] = v.min(axis=1).astype(np.int64)
    return sigs


def _lsh_pair_bands(
    sigs: dict[int, np.ndarray],
    num_hashes: int,
    bands: int,
    seed: int,
    max_bucket_width: int,
    template_bucket_frac: float | None = 0.01,
    template_bucket_width: int = 64,
) -> dict[tuple[int, int], int]:
    """(doc_a, doc_b) -> n_bands_matched via banded buckets with the
    deterministic hot-bucket cap — the r14 declared semantics of
    operators/dedup_fuzzy.py:minhash_lsh_pairs:

    - saturated bucket (width > max_bucket_width): retain the top-cap by
      (xxhash64(doc_id, seed), doc_id) PLUS the bucket's min doc_id
      anchor; all-pair the retained set;
    - template bucket (width also > template_bucket_frac * corpus size):
      the cap drops to min(template_bucket_width, max_bucket_width);
    - spanning star: every truncated member still pairs once with the
      bucket's min-id anchor.
    """
    r = num_hashes // bands
    n_docs = len(sigs)
    banded: dict[tuple[int, str], list[int]] = {}
    for doc_id, sig in sigs.items():
        for i in range(bands):
            key = ",".join(str(int(s)) for s in sig[i * r : (i + 1) * r])
            bucket = hashlib.sha1(key.encode()).hexdigest()
            banded.setdefault((i, bucket), []).append(doc_id)

    pair_bands: dict[tuple[int, int], int] = {}

    def _count(a: int, b: int) -> None:
        pr = (a, b) if a < b else (b, a)
        pair_bands[pr] = pair_bands.get(pr, 0) + 1

    for members in banded.values():
        if len(members) > max_bucket_width:
            cap = max_bucket_width
            if template_bucket_frac is not None and len(members) > max(
                max_bucket_width, template_bucket_frac * n_docs
            ):
                cap = min(template_bucket_width, max_bucket_width)
            ranked = sorted(
                members, key=lambda d: (spark_xxhash64(d, Int32(seed)), d)
            )
            anchor = min(members)
            kept = set(ranked[:cap]) | {anchor}
            ms = sorted(kept)
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    _count(ms[i], ms[j])
            for m in members:
                if m not in kept:
                    _count(anchor, m)
        else:
            ms = sorted(members)
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    _count(ms[i], ms[j])
    return pair_bands


def docs_minhash_lsh_dedup(
    sf_dir: str,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    max_bucket_width: int = 256,
    template_bucket_frac: float | None = 0.01,
    template_bucket_width: int = 64,
) -> list[tuple]:
    sigs = _minhash_sigs(sf_dir, k, num_hashes, seed)
    pair_bands = _lsh_pair_bands(
        sigs, num_hashes, bands, seed, max_bucket_width,
        template_bucket_frac, template_bucket_width,
    )
    rows = []
    for (da, db), nb in pair_bands.items():
        agree = int(np.sum(sigs[da] == sigs[db]))
        rows.append((da, db, nb, _round6(agree / num_hashes)))
    return sorted(rows)


def docs_minhash_keep(
    sf_dir: str,
    threshold: float = 0.9,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    max_bucket_width: int = 256,
    template_bucket_frac: float | None = 0.01,
    template_bucket_width: int = 64,
) -> list[tuple]:
    """Re-derive minhash_dedup_keep's DECLARED semantics (keep-list,
    collapse-first): (1) per exact-signature-vector family only the min
    doc_id survives to the banded tier; (2) banded LSH pairs over the
    representatives (cap applied to the rep population); (3) a rep is
    dropped when it is the greater id of a pair whose rounded
    signature-agreement fraction >= threshold. Output: surviving doc_ids,
    one column."""
    sigs = _minhash_sigs(sf_dir, k, num_hashes, seed)
    fam_min: dict[bytes, int] = {}
    for doc_id, sig in sigs.items():
        key = sig.tobytes()
        if key not in fam_min or doc_id < fam_min[key]:
            fam_min[key] = doc_id
    rep_sigs = {d: sigs[d] for d in fam_min.values()}
    pair_bands = _lsh_pair_bands(
        rep_sigs, num_hashes, bands, seed, max_bucket_width,
        template_bucket_frac, template_bucket_width,
    )
    dropped = set()
    for (da, db), _nb in pair_bands.items():
        agree = int(np.sum(rep_sigs[da] == rep_sigs[db]))
        if _round6(agree / num_hashes) >= threshold:
            dropped.add(max(da, db))
    return sorted((d,) for d in rep_sigs if d not in dropped)


def docs_simhash_pairs(sf_dir: str, max_hamming: int = 8) -> list[tuple]:
    t = _read(sf_dir, "documents")
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()

    chunks: dict[int, tuple[int, int, int, int]] = {}
    for doc_id, text in zip(doc_ids, texts):
        toks = list(dict.fromkeys(_tokens(text)))  # array_distinct order
        hashes = [spark_xxhash64(tk) for tk in toks]
        cs = []
        for ci in range(4):
            val = 0
            for j in range(16):
                bit_idx = ci * 16 + j
                s = sum(1 if (h >> bit_idx) & 1 else -1 for h in hashes)
                if s > 0:
                    val |= 1 << j
            cs.append(val)
        chunks[doc_id] = tuple(cs)

    blocks: dict[tuple[int, int], list[int]] = {}
    for doc_id, cs in chunks.items():
        for ci in range(4):
            blocks.setdefault((ci, cs[ci]), []).append(doc_id)
    cand = set()
    for members in blocks.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cand.add((ms[i], ms[j]))
    rows = []
    for da, db in cand:
        ham = sum(
            bin(chunks[da][ci] ^ chunks[db][ci]).count("1") for ci in range(4)
        )
        if ham <= max_hamming:
            rows.append((da, db, ham))
    return sorted(rows)


# ---------------------------------------------------------------------------
# embeddings: LSH ANN / IVF ANN / near-dup
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    import random

    rng = random.Random(seed)
    return np.array(
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)],
        dtype=np.float64,
    )


def _load_embeddings(sf_dir: str):
    t = _read(sf_dir, "embeddings")
    ids = t.column("vec_id").to_pylist()
    vecs = [np.asarray(v, dtype=np.float32) for v in t.column("embedding").to_pylist()]
    return ids, vecs


def _sign_bits(vecs: list[np.ndarray], planes: np.ndarray) -> np.ndarray:
    # the engine's documented matmul (see module docstring)
    m = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs], dtype=np.float64)
    return (m @ planes.T >= 0).astype(np.int32)


def _buckets(bits: np.ndarray, bands: int) -> list[list[str]]:
    n_bits = bits.shape[1]
    r = n_bits // bands
    return [
        ["".join(str(int(x)) for x in row[i * r : (i + 1) * r]) for i in range(bands)]
        for row in bits
    ]


def _rank_topk(scored: dict[int, list[tuple[float, int]]], k: int) -> list[tuple]:
    rows = []
    for qid, items in scored.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        for rank, (cos, nid) in enumerate(items[:k], start=1):
            rows.append((qid, nid, cos, rank))
    return sorted(rows)


def emb_ann_lsh(
    sf_dir: str,
    k: int = 5,
    dim: int = 64,
    n_bits: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> list[tuple]:
    ids, vecs = _load_embeddings(sf_dir)
    planes = _hyperplanes(dim, n_bits, seed)
    bits = _sign_bits(vecs, planes)
    bks = _buckets(bits, bands)
    qidx = [i for i, vid in enumerate(ids) if vid < 8]

    scored: dict[int, list[tuple[float, int]]] = {ids[i]: [] for i in qidx}
    for qi in qidx:
        qb = set((band, bk) for band, bk in enumerate(bks[qi]))
        seen = set()
        for ci, cid in enumerate(ids):
            if cid == ids[qi] or ci in seen:
                continue
            if any((band, bk) in qb for band, bk in enumerate(bks[ci])):
                cos = _round6(_cosine(vecs[qi], vecs[ci]))
                scored[ids[qi]].append((cos, cid))
                seen.add(ci)
    return _rank_topk(scored, k)


def emb_lsh_near_dup(
    sf_dir: str,
    threshold: float = 0.25,
    dim: int = 64,
    n_bits: int = 16,
    bands: int = 8,
    seed: int = 42,
) -> list[tuple]:
    ids, vecs = _load_embeddings(sf_dir)
    planes = _hyperplanes(dim, n_bits, seed)
    bits = _sign_bits(vecs, planes)
    bks = _buckets(bits, bands)

    blocks: dict[tuple[int, str], list[int]] = {}
    for i, _ in enumerate(ids):
        for band, bk in enumerate(bks[i]):
            blocks.setdefault((band, bk), []).append(i)
    cand = set()
    for members in blocks.values():
        ms = sorted(members, key=lambda i: ids[i])
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cand.add((ms[i], ms[j]))
    rows = []
    for ia, ib in cand:
        cos = _round6(_cosine(vecs[ia], vecs[ib]))
        if cos >= threshold:
            rows.append((ids[ia], ids[ib], cos))
    return sorted(rows)


def emb_ann_ivf(
    sf_dir: str,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    refine_iters: int = 0,
    refine_sample_mod: int = 1,
    refine_sample_seed: int = 43,
) -> list[tuple]:
    ids, vecs = _load_embeddings(sf_dir)
    hs = [(spark_xxhash64(str(vid), Int32(seed)), vid, i) for i, vid in enumerate(ids)]
    hs.sort()
    centroids = [vecs[i] for _, _, i in hs[:n_cells]]  # cell = rank order

    def dists(v: np.ndarray) -> list[tuple[float, int]]:
        return [(-_cosine(v, c), cell) for cell, c in enumerate(centroids)]

    # sampled refinement replays the engine's deterministic slice:
    # pmod(xxhash64(str(id), sample_seed), sample_mod) == 0
    refine_vecs = [
        v
        for i, v in enumerate(vecs)
        if refine_sample_mod <= 1
        or spark_xxhash64(str(ids[i]), Int32(refine_sample_seed))
        % refine_sample_mod
        == 0
    ]
    for _ in range(refine_iters):
        # Lloyd step, replicating the engine's decimal-staged mean:
        # sum(floor(float64(v) * 1e9)) exactly (Python ints), cast the
        # integer sum to double, /1e9, /count, ROUND_HALF_UP at 6.
        members: dict[int, list[np.ndarray]] = {}
        for v in refine_vecs:
            members.setdefault(min(dists(v))[1], []).append(v)
        new_centroids = []
        for cell, c in enumerate(centroids):
            ms = members.get(cell)
            if not ms:
                new_centroids.append(np.asarray(c, dtype=np.float64))
                continue
            dim = len(ms[0])
            cv = []
            for pos in range(dim):
                staged_sum = sum(
                    int(np.floor(np.float64(m[pos]) * 1e9)) for m in ms
                )
                cv.append(_round6(float(staged_sum) / 1e9 / len(ms)))
            new_centroids.append(np.asarray(cv, dtype=np.float64))
        centroids = new_centroids

    assign = {ids[i]: min(dists(v)) [1] for i, v in enumerate(vecs)}
    qidx = [i for i, vid in enumerate(ids) if vid < 8]
    scored: dict[int, list[tuple[float, int]]] = {ids[i]: [] for i in qidx}
    for qi in qidx:
        probed = {cell for _, cell in sorted(dists(vecs[qi]))[:n_probe]}
        for ci, cid in enumerate(ids):
            if cid == ids[qi] or assign[cid] not in probed:
                continue
            cos = _round6(_cosine(vecs[qi], vecs[ci]))
            scored[ids[qi]].append((cos, cid))
    return _rank_topk(scored, k)


def emb_ann_ivf_refined(sf_dir: str) -> list[tuple]:
    # mirrors plans/corpus.py emb_ann_ivf_refined: 2 Lloyd iterations on
    # the deterministic 1/4 hash-sample (the 100 TB refinement shape)
    return emb_ann_ivf(sf_dir, refine_iters=2, refine_sample_mod=4)


# ---------------------------------------------------------------------------
# ctlog synthetic scan
# ---------------------------------------------------------------------------


def s1_ctlog_scan(
    sf_dir: str,
    log_url: str = "ct.example/log0",
    tree_size: int = 5000,
    offset: int = 500,
) -> list[tuple]:
    per_issuer: dict[str, list[int]] = {}
    for i in range(offset, tree_size):
        d = hashlib.sha256(f"{log_url}:{i}".encode()).digest()
        per_issuer.setdefault(f"issuer-{d[16] % 8}", []).append(i)
    return sorted(
        (iss, len(es), min(es), max(es)) for iss, es in per_issuer.items()
    )


# ---------------------------------------------------------------------------
# multimodal fixtures (BMP featurize re-derived from the ORIGINAL pixel
# buffer — sampling straight from the pre-encode RGB independently checks
# the engine's encode->parse->sample round trip)
# ---------------------------------------------------------------------------


def _synth_media(n: int = 200, seed: int = 42):
    """Re-derive the synthetic_media fixture stream: (media_id, kind,
    payload_len, rgb, w, h, raw_payload, pcm, sr, channels, empty,
    corrupt). BMP container layout is the public Windows format; WAV is
    the public RIFF/WAVE PCM-16 layout (44-byte canonical header)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    out = []
    for i in range(n):
        kind = kinds[i % 3]
        rgb = w = h = payload = pcm = sr = channels = None
        if kind == "image":
            w = int(rng.integers(4, 33))
            h = int(rng.integers(4, 33))
            rgb = rng.integers(0, 256, size=3 * w * h, dtype=np.uint8).tobytes()
            pad = (-3 * w) % 4
            payload_len = 54 + (3 * w + pad) * h
        elif kind == "audio":
            sr = [8000, 16000, 22050, 44100][int(rng.integers(0, 4))]
            channels = int(rng.integers(1, 3))
            frames = int(rng.integers(64, 2048))
            pcm = rng.integers(-32768, 32768, size=frames * channels, dtype=np.int16)
            payload_len = 44 + 2 * frames * channels
        else:
            w = int(rng.integers(4, 17))
            h = int(rng.integers(4, 17))
            n_frames = int(rng.integers(2, 11))
            vframes = [
                rng.integers(0, 256, size=3 * w * h, dtype=np.uint8).tobytes()
                for _ in range(n_frames)
            ]
            payload = vframes  # list of pre-encode RGB frames
            payload_len = None  # AVI length not needed by any derivation
        empty = i % 37 == 0
        corrupt = (not empty) and (
            i % 51 == 0
            or (kind == "audio" and i % 55 == 0)
            or (kind == "video" and i % 56 == 0)
        )
        out.append(
            (i, kind, payload_len, rgb, w, h, payload, pcm, sr, channels,
             empty, corrupt)
        )
    return out


def _gray(rgb: bytes, w: int, x: int, y: int) -> float:
    r, g, b = rgb[3 * (y * w + x) : 3 * (y * w + x) + 3]
    return (299 * r + 587 * g + 114 * b) // 1000 / 255.0


def _wav_feats(pcm: np.ndarray, sr: int, channels: int) -> list[float]:
    """Audio features re-derived from the ORIGINAL int16 samples (never
    the encoded payload — independently checks the WAV encode->parse
    round trip). Time-domain stats are exact int64 sums; the 12 spectral
    band fractions share numpy's FFT (module-docstring caveat)."""
    samples = pcm.reshape(-1, channels)
    n_total = samples.shape[0]
    mono = samples.astype(np.int64).sum(axis=1) // channels
    x = mono[:65536]
    m = len(x)
    feats = [
        min(1.0, (n_total / sr) / 10.0),
        float(np.sqrt(int(np.sum(x * x)) / m) / 32768.0),
        float(np.count_nonzero((x[1:] >= 0) != (x[:-1] >= 0)) / (m - 1))
        if m > 1
        else 0.0,
        float(int(np.sum(np.abs(x))) / m / 32768.0),
    ]
    power = np.abs(np.fft.rfft(x.astype(np.float64))) ** 2
    tail = power[1:]
    total = float(tail.sum())
    if total > 0.0 and len(tail) >= 1:
        feats.extend(float(b.sum() / total) for b in np.array_split(tail, 12))
    else:
        feats.extend([0.0] * 12)
    return feats


def mm_extract_features(sf_dir: str, n: int = 200, seed: int = 42) -> list[tuple]:
    per_kind: dict[str, list[tuple[bool, list[float] | None]]] = {}
    for (i, kind, _plen, rgb, w, h, payload, pcm, sr, channels, empty,
         corrupt) in _synth_media(n, seed):
        if empty or corrupt:
            ok, feats = False, None
        elif kind == "image":
            feats = [
                _gray(
                    rgb,
                    w,
                    min(w - 1, (fj * w + w // 2) // 4),
                    min(h - 1, (fi * h + h // 2) // 4),
                )
                for fi in range(4)
                for fj in range(4)
            ]
            ok = True
        elif kind == "audio":
            feats, ok = _wav_feats(pcm, sr, channels), True
        else:
            # video: 4 evenly-sampled frames x 2x2 pixel grid, re-derived
            # from the ORIGINAL per-frame RGB (checks the AVI round trip)
            vframes = payload
            nf = len(vframes)
            feats = [
                _gray(
                    vframes[min(nf - 1, (fi * nf + nf // 2) // 4)],
                    w,
                    min(w - 1, (gx * w + w // 2) // 2),
                    min(h - 1, (gy * h + h // 2) // 2),
                )
                for fi in range(4)
                for gy in range(2)
                for gx in range(2)
            ]
            ok = True
        per_kind.setdefault(kind, []).append((ok, feats))

    rows = []
    for kind, items in per_kind.items():
        total = Decimal(0)
        n_ok = 0
        for ok, feats in items:
            if not ok:
                continue
            n_ok += 1
            acc = 0.0
            for v in feats:
                acc += float(np.float32(v))  # array<float> storage round-trip
            total += Decimal(repr(_round6(acc))).quantize(
                Decimal("0.000001"), ROUND_HALF_UP
            )
        rows.append((kind, len(items), n_ok, float(total)))
    return sorted(rows)


def mm_sample_frames(
    sf_dir: str,
    n: int = 200,
    seed: int = 42,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
) -> list[tuple]:
    rows = []
    for (i, kind, _plen, _rgb, w, h, payload, _pcm, _sr, _ch, empty,
         corrupt) in _synth_media(n, seed):
        if kind != "video":
            continue
        if empty:
            continue
        stride = 3 * w + ((-3 * w) % 4)
        n_frames = len(payload)
        if corrupt:
            # JUNK prefix keeps the AVI byte length; the engine falls back
            # to fixed-size byte slices. Container layout: 8 (RIFF hdr) +
            # 4 ('AVI ') + 196 (hdrl) + 12 (movi LIST hdr) + per-frame
            # (8-byte chunk hdr + stride*h DIB)
            length = 220 + n_frames * (8 + stride * h)
            nf = min(max_frames, length // every_n_bytes)
            if nf > 0:
                rows.append((i, nf, nf * every_n_bytes))
            continue
        nf = min(max_frames, n_frames)
        rows.append((i, nf, nf * stride * h))
    return sorted(rows)


def emb_semdedup(
    sf_dir: str,
    threshold: float = 0.25,
    n_cells: int = 16,
    seed: int = 42,
) -> list[tuple]:
    # mirrors operators/similarity.py:semdedup_pairs — seeded centroid
    # pick (lowest xxhash64), narrow nearest-cell assignment (min on
    # (-cosine, cell)), within-cell pairs a<b filtered on the UNROUNDED
    # cosine, output rounded to 6.
    ids, vecs = _load_embeddings(sf_dir)
    hs = [(spark_xxhash64(str(vid), Int32(seed)), vid, i) for i, vid in enumerate(ids)]
    hs.sort()
    centroids = [vecs[i] for _, _, i in hs[:n_cells]]
    cnorms = [_fold_norm(c) for c in centroids]

    def cell_of(v: np.ndarray) -> int:
        vn = _fold_norm(v)
        return min(
            (-(_fold_dot(v, c) / (vn * cn)), cell)
            for cell, (c, cn) in enumerate(zip(centroids, cnorms))
        )[1]

    members: dict[int, list[int]] = {}
    for i, v in enumerate(vecs):
        members.setdefault(cell_of(v), []).append(i)
    rows = []
    for cell, idx in members.items():
        idx = sorted(idx, key=lambda i: ids[i])
        for ai in range(len(idx)):
            for bi in range(ai + 1, len(idx)):
                a, b = idx[ai], idx[bi]
                cos = _cosine(vecs[a], vecs[b])
                if cos >= threshold:
                    rows.append((cell, ids[a], ids[b], _round6(cos)))
    return sorted(rows)


def emb_prototype_prune(
    sf_dir: str,
    keep_frac: float = 0.5,
    n_cells: int = 16,
    seed: int = 42,
) -> list[tuple]:
    # mirrors operators/similarity.py:prototype_prune — seeded centroid
    # pick (lowest xxhash64), nearest-cell assignment (min on
    # (-cosine, cell)), per-cell rank by (proto_cos asc, id) keeping
    # ceil(keep_frac * cell_n) hardest rows, proto_cos rounded to 6
    # only at output.
    import math

    ids, vecs = _load_embeddings(sf_dir)
    hs = [(spark_xxhash64(str(vid), Int32(seed)), vid, i) for i, vid in enumerate(ids)]
    hs.sort()
    centroids = [vecs[i] for _, _, i in hs[:n_cells]]
    cnorms = [_fold_norm(c) for c in centroids]

    members: dict[int, list[tuple[float, int]]] = {}
    for i, v in enumerate(vecs):
        vn = _fold_norm(v)
        neg_cos, cell = min(
            (-(_fold_dot(v, c) / (vn * cn)), cell)
            for cell, (c, cn) in enumerate(zip(centroids, cnorms))
        )
        members.setdefault(cell, []).append((-neg_cos, ids[i]))
    rows = []
    for cell, scored in members.items():
        scored.sort()  # (proto_cos asc, id asc) — hardest first
        n_keep = math.ceil(keep_frac * len(scored))
        for pc, vid in scored[:n_keep]:
            rows.append((vid, cell, _round6(pc)))
    return sorted(rows)


def emb_pq_topk(
    sf_dir: str,
    k: int = 5,
    m_sub: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    rerank_factor: int = 0,
) -> list[tuple]:
    # mirrors operators/similarity.py:pq_codebooks/pq_encode/pq_topk —
    # per-subspace seeded codebooks (lowest xxhash64(id, seed+j)), argmin
    # L2 encode (sequential fold, lowest code on ties), ADC scoring via
    # per-query LUTs summed in subspace order, rank on the ROUNDED score.
    ids, vecs = _load_embeddings(sf_dir)
    dim = len(vecs[0])
    d = dim // m_sub
    books: list[list[np.ndarray]] = []
    for j in range(m_sub):
        hs = [
            (spark_xxhash64(str(vid), Int32(seed + j)), vid, i)
            for i, vid in enumerate(ids)
        ]
        hs.sort()
        books.append(
            [
                np.asarray(
                    [float(x) for x in vecs[i][j * d : (j + 1) * d]],
                    dtype=np.float64,
                )
                for _, _, i in hs[:n_codes]
            ]
        )

    def encode(v: np.ndarray) -> list[int]:
        codes = []
        for j, book in enumerate(books):
            sub = v[j * d : (j + 1) * d]
            best = None
            for code, cvec in enumerate(book):
                acc = 0.0
                for x, y in zip(sub.astype(np.float64), cvec):
                    diff = float(x) - float(y)
                    acc += diff * diff
                if best is None or (acc, code) < best:
                    best = (acc, code)
            codes.append(best[1])
        return codes

    codes = {ids[i]: encode(v) for i, v in enumerate(vecs)}
    scored: dict[int, list[tuple[float, int]]] = {}
    for qi, qid in enumerate(ids):
        if qid >= 8:
            continue
        lut = [
            [_fold_dot(vecs[qi][j * d : (j + 1) * d], cvec) for cvec in book]
            for j, book in enumerate(books)
        ]
        items = []
        for nid in ids:
            if nid == qid:
                continue
            acc = 0.0
            for j, code in enumerate(codes[nid]):
                acc += lut[j][code]
            items.append((_round6(acc), nid))
        if rerank_factor:
            # shortlist by (ADC desc, id asc), then exact-cosine re-score
            items.sort(key=lambda t: (-t[0], t[1]))
            by_id = {vid: i for i, vid in enumerate(ids)}
            items = [
                (_round6(_cosine(vecs[qi], vecs[by_id[nid]])), nid)
                for _, nid in items[: k * rerank_factor]
            ]
        scored[qid] = items
    return _rank_topk(scored, k)


def emb_pq_rerank_topk(sf_dir: str) -> list[tuple]:
    # mirrors plans/corpus.py emb_pq_rerank_topk: ADC shortlist k*4,
    # exact-cosine re-rank of the shortlist only
    return emb_pq_topk(sf_dir, rerank_factor=4)


def emb_pq_ivf_topk(
    sf_dir: str,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    m_sub: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    rerank_factor: int = 4,
    residual: bool = False,
    refine_iters: int = 0,
    refine_sample_mod: int = 1,
    refine_sample_seed: int = 43,
) -> list[tuple]:
    """Re-derive IVF-PQ serving (similarity.py:pq_ivf_topk_indexed) by
    composition: emb_ann_ivf's centroid pick / cell assignment / probe
    rule + emb_pq_topk's codebooks / encode / ADC LUT, with candidates
    RESTRICTED to the query's n_probe nearest cells, then the
    (-adc, nid) shortlist of k*rerank_factor re-scored by exact
    cosine. residual=True replays the residual-IVFADC tier: codebooks
    over and codes of float64(x) - float64(centroid(cell(x))), score =
    round(<q, centroid> + ADC, 6) — LUTs stay on the raw query
    sub-vectors (inner products distribute over the decomposition).
    refine_iters replays pq_ivf_build_index's Lloyd refinement of the
    seeded centroids (emb_ann_ivf's decimal-staged mean, identical
    replay) BEFORE assignment/residual/probing — the r9 guidance pairs
    it with the residual tier."""
    ids, vecs = _load_embeddings(sf_dir)
    dim = len(vecs[0])
    d = dim // m_sub
    # IVF half: seeded centroids (lowest xxhash64(str(id), seed)), cell
    # = rank order; assignment/probes by (-cosine, cell)
    hs = [
        (spark_xxhash64(str(vid), Int32(seed)), vid, i)
        for i, vid in enumerate(ids)
    ]
    hs.sort()
    centroids = [vecs[i] for _, _, i in hs[:n_cells]]

    def dists(v: np.ndarray) -> list[tuple[float, int]]:
        return [(-_cosine(v, c), cell) for cell, c in enumerate(centroids)]

    if refine_iters:
        # Lloyd replay, identical to emb_ann_ivf's: deterministic hash
        # sample, decimal-staged mean (sum of floor(float64(v)*1e9) as
        # exact ints, /1e9 /count, ROUND_HALF_UP at 6), empty cells keep
        # their previous centroid.
        refine_vecs = [
            v
            for i, v in enumerate(vecs)
            if refine_sample_mod <= 1
            or spark_xxhash64(str(ids[i]), Int32(refine_sample_seed))
            % refine_sample_mod
            == 0
        ]
        for _ in range(refine_iters):
            members: dict[int, list[np.ndarray]] = {}
            for v in refine_vecs:
                members.setdefault(min(dists(v))[1], []).append(v)
            new_centroids = []
            for cell, c in enumerate(centroids):
                ms = members.get(cell)
                if not ms:
                    new_centroids.append(np.asarray(c, dtype=np.float64))
                    continue
                cv = []
                for pos in range(dim):
                    staged_sum = sum(
                        int(np.floor(np.float64(m[pos]) * 1e9)) for m in ms
                    )
                    cv.append(_round6(float(staged_sum) / 1e9 / len(ms)))
                new_centroids.append(np.asarray(cv, dtype=np.float64))
            centroids = new_centroids

    assign = {ids[i]: min(dists(v))[1] for i, v in enumerate(vecs)}
    # residual tier: the encode source is float64(x) - float64(centroid)
    # element-wise (the engine's zip_with cast order); raw tier encodes
    # the vectors themselves
    if residual:
        enc_src = [
            np.asarray(v, dtype=np.float64)
            - np.asarray(centroids[assign[ids[i]]], dtype=np.float64)
            for i, v in enumerate(vecs)
        ]
    else:
        enc_src = list(vecs)
    # PQ half: per-subspace seeded codebooks + argmin-L2 encode
    books: list[list[np.ndarray]] = []
    for j in range(m_sub):
        hj = [
            (spark_xxhash64(str(vid), Int32(seed + j)), vid, i)
            for i, vid in enumerate(ids)
        ]
        hj.sort()
        books.append(
            [
                np.asarray(
                    [float(x) for x in enc_src[i][j * d : (j + 1) * d]],
                    dtype=np.float64,
                )
                for _, _, i in hj[:n_codes]
            ]
        )

    def encode(v: np.ndarray) -> list[int]:
        codes = []
        for j, book in enumerate(books):
            sub = v[j * d : (j + 1) * d]
            best = None
            for code, cvec in enumerate(book):
                acc = 0.0
                for x, y in zip(sub.astype(np.float64), cvec):
                    diff = float(x) - float(y)
                    acc += diff * diff
                if best is None or (acc, code) < best:
                    best = (acc, code)
            codes.append(best[1])
        return codes

    codes = {ids[i]: encode(enc_src[i]) for i in range(len(ids))}
    by_id = {vid: i for i, vid in enumerate(ids)}
    scored: dict[int, list[tuple[float, int]]] = {}
    for qi, qid in enumerate(ids):
        if qid >= 8:
            continue
        probed = {cell for _, cell in sorted(dists(vecs[qi]))[:n_probe]}
        lut = [
            [_fold_dot(vecs[qi][j * d : (j + 1) * d], cvec) for cvec in book]
            for j, book in enumerate(books)
        ]
        items = []
        for nid in ids:
            if nid == qid or assign[nid] not in probed:
                continue
            acc = 0.0
            for j, code in enumerate(codes[nid]):
                acc += lut[j][code]
            if residual:  # <q,x> = <q,c> + <q,r>: add the cell term back
                acc = _fold_dot(vecs[qi], centroids[assign[nid]]) + acc
            items.append((_round6(acc), nid))
        if rerank_factor:
            items.sort(key=lambda t: (-t[0], t[1]))
            items = [
                (_round6(_cosine(vecs[qi], vecs[by_id[nid]])), nid)
                for _, nid in items[: k * rerank_factor]
            ]
        scored[qid] = items
    return _rank_topk(scored, k)


def docs_incremental_dedup(
    sf_dir: str,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> list[tuple]:
    """Re-derive minhash_probe_index: batch (doc_id % 10 == 0) probed
    against the corpus (doc_id % 10 != 0) posting lists. Same signature
    family as docs_minhash_lsh_dedup; no hot-bucket cap (capping is a
    build-time policy, the probe replays postings as materialized)."""
    t = _read(sf_dir, "documents")
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()

    p = np.uint64((1 << 61) - 1)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=num_hashes, dtype=np.uint64)

    r = num_hashes // bands
    sigs: dict[int, np.ndarray] = {}
    for doc_id, text in zip(doc_ids, texts):
        sh = _shingles(text, k)
        if not sh:
            sigs[doc_id] = np.zeros(num_hashes, dtype=np.int64)
            continue
        base = np.array(
            [spark_xxhash64(s, Int32(seed)) for s in sh], dtype=np.int64
        )
        x = base.view(np.uint64) & p
        with np.errstate(over="ignore"):
            v = (a[:, None] * x[None, :] + b[:, None]) % p
        sigs[doc_id] = v.min(axis=1).astype(np.int64)

    banded: dict[tuple[int, str], list[int]] = {}
    for doc_id, sig in sigs.items():
        for i in range(bands):
            key = ",".join(str(int(s)) for s in sig[i * r : (i + 1) * r])
            bucket = hashlib.sha1(key.encode()).hexdigest()
            banded.setdefault((i, bucket), []).append(doc_id)

    pair_bands: dict[tuple[int, int], int] = {}
    for members in banded.values():
        news = [d for d in members if d % 10 == 0]
        olds = [d for d in members if d % 10 != 0]
        for dn in news:
            for dc in olds:
                pr = (dn, dc)
                pair_bands[pr] = pair_bands.get(pr, 0) + 1

    rows = []
    for (dn, dc), nb in pair_bands.items():
        agree = int(np.sum(sigs[dn] == sigs[dc]))
        rows.append((dn, dc, nb, _round6(agree / num_hashes)))
    return sorted(rows)


def s14_warc_scan(sf_dir: str, n: int = 64) -> list[tuple]:
    """Expected rows of the WARC fixture scan, derived from the RECORD
    DEFINITIONS (the same arithmetic synthetic_warc_fixture uses), never
    from the engine's encoder or parser — a round-trip gate like the
    media pins."""
    rows = []
    for i in range(n):
        body = f"synthetic corpus sentence {i * 37 % 101}. " * ((i % 7) + 1)
        rows.append(
            (
                "request" if i % 5 == 0 else "response",
                f"https://corpus.example/doc/{i}",
                f"<urn:uuid:{i:08d}>",
                "text/plain",
                len(body.encode()),
                hashlib.md5(body.encode()).hexdigest(),
            )
        )
    return sorted(rows)


def s15_warc_html_pipeline(sf_dir: str, n: int = 32) -> list[tuple]:
    """Replay the HTML-crawl pipeline in pure python: the SAME body
    template arithmetic, the SAME header-strip rule (first CRLF CRLF),
    and the SAME ordered regex battery — python `re` and Spark's Java
    regex agree on this pattern subset by construction."""
    import re

    # &amp; decodes LAST among entities (standard order — earlier
    # decoding double-decodes escaped references like '&amp;lt;').
    rules = [
        (r"(?is)<script\b[^>]*>.*?</script>", " "),
        (r"(?is)<style\b[^>]*>.*?</style>", " "),
        (r"(?is)<!--.*?-->", " "),
        (r"(?is)<[^>]+>", " "),
        (r"&nbsp;", " "),
        (r"&lt;", "<"),
        (r"&gt;", ">"),
        (r"&quot;", "\""),
        (r"&#39;", "'"),
        (r"&amp;", "&"),
        (r"\s+", " "),
    ]
    rows = []
    for i in range(n):
        paras = "".join(
            f"<p>paragraph {j} of doc {i} &amp; more</p>"
            for j in range((i % 5) + 1)
        )
        html = (
            f"<html><head><title>Doc {i}</title>"
            f"<style>p {{color: #{i:06d}}}</style>"
            f"<script>var x = {i}; if (x < 99) {{ x += 1; }}</script>"
            f"</head><body><h1>Title &lt;{i}&gt;</h1>{paras}"
            f"<!-- hidden comment {i} -->&quot;quoted&quot;&#39;s</body></html>"
        )
        body = (
            "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            f"Content-Length: {len(html)}\r\n\r\n" + html
        )
        sep = body.find("\r\n\r\n")
        txt = body[sep + 4 :] if sep >= 0 else body
        for pat, rep in rules:
            txt = re.sub(pat, rep, txt)
        txt = txt.strip()
        rows.append(
            (
                f"https://crawl.example/page/{i}",
                hashlib.md5(txt.encode()).hexdigest(),
                len(txt.split(" ")) if txt.strip() else 1,
                len(txt),
            )
        )
    return sorted(rows)


def s16_warc_domain_stats(sf_dir: str, n: int = 60) -> list[tuple]:
    """Replay the multi-domain fixture's record DEFINITIONS (the same
    arithmetic synthetic_warc_multidomain_fixture uses) and roll up per
    registered domain — never touching the engine's encoder, parser, or
    URL functions."""
    from collections import defaultdict

    doms = ["news", "blog", "shop", "docs", "wiki"]
    # registered domains BY CONSTRUCTION: the fixture builds each URL as
    # <sub>.<base>.<public suffix>, so the expected registered domain is
    # base.suffix directly from the record definitions — the engine's
    # PSL lookup (operators/web.py:add_registered_domain) must recover
    # exactly these, including the multi-label suffixes (co.uk,
    # github.io, com.au) the last-two-labels rule mis-grouped
    sufs = ["example", "co.uk", "github.io", "com.au", "example"]
    agg = defaultdict(lambda: [0, set(), 0, 0])
    for i in range(n):
        if i % 4 == 0:  # request records are filtered out
            continue
        dom = f"{doms[i % 5]}.{sufs[i % 5]}"
        url = f"https://{['www', 'm', 'api'][i % 3]}.{dom}/p/{i}"
        body = f"page text for {doms[i % 5]} item {i * 13 % 17} " * (
            (i % 6) + 2
        )
        a = agg[dom]
        a[0] += 1
        a[1].add(url)
        a[2] += len(body.strip().split())
        a[3] += len(body)
    return sorted(
        (dom, a[0], len(a[1]), a[2], a[3]) for dom, a in agg.items()
    )


def s17_warc_domain_quality(sf_dir: str, n: int = 60) -> list[tuple]:
    """Replay the multi-domain fixture's record definitions, score each
    page with a pure-python replica of the DECLARED quality formula
    (text.py:quality_score docstring: fixed op order, one HALF_UP round
    at 6), and triage per registered domain. Quality sums accumulate as
    exact integer micro-units (the rounded score has exactly 6
    decimals), mirroring the engine's DECIMAL(16,6) staged sum."""
    import math
    import re
    from collections import defaultdict

    # the declared stopword union (text.py STOPWORDS — inlined, no
    # engine import so this stays a no-Spark derivation)
    stop = {
        "the", "and", "of", "to", "a", "in", "is", "that",
        "der", "die", "das", "und", "ist", "nicht", "ein", "zu",
        "el", "la", "de", "que", "y", "en", "un", "es",
        "le", "et", "les", "des", "une", "est",
        "的", "是", "了", "在", "和", "有", "我", "不",
    }

    def quality_micro(text: str) -> int:
        toks = re.split(r"\s+", text.strip())
        n_tok = max(len(toks), 1)
        n_stop = sum(1 for t in toks if t in stop)
        punct = sum(1 for ch in text if ch in ".,;:!?")
        s_len = min(1.0, len(toks) / 50.0)
        s_stop = min(1.0, (n_stop / n_tok) * 4.0)
        s_rep = len(set(toks)) / n_tok
        s_punct = 1.0 - min(1.0, (punct / max(len(text), 1)) * 10.0)
        x = (s_len + s_stop + s_rep + s_punct) / 4.0
        return int(math.floor(x * 1e6 + 0.5))  # HALF_UP at 6, non-negative

    doms = ["news", "blog", "shop", "docs", "wiki"]
    sufs = ["example", "co.uk", "github.io", "com.au", "example"]
    agg = defaultdict(lambda: [0, 0, 0])  # n_pages, sum_micro, n_lowq
    for i in range(n):
        if i % 4 == 0:
            continue
        dom = f"{doms[i % 5]}.{sufs[i % 5]}"
        body = f"page text for {doms[i % 5]} item {i * 13 % 17} " * (
            (i % 6) + 2
        )
        qm = quality_micro(body)
        a = agg[dom]
        a[0] += 1
        a[1] += qm
        a[2] += 1 if (qm / 1e6) < 0.4 else 0

    def r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    rows = []
    for dom, (np_, sm, lowq) in agg.items():
        mean_q = r6((float(sm) / 1e6) / np_)
        lf = r6(lowq / np_)
        rows.append(
            (dom, np_, mean_q, lowq, lf, mean_q >= 0.5 and lf <= 0.5)
        )
    return sorted(rows)


def emb_pq_ivf_refined_topk(sf_dir: str) -> list[tuple]:
    # mirrors plans/corpus.py emb_pq_ivf_refined_topk: the recommended
    # r9 serving composition — residual IVFADC under a Lloyd-refined
    # (2 iterations, 1/4 hash-sample) coarse quantizer
    return emb_pq_ivf_topk(
        sf_dir, residual=True, refine_iters=2, refine_sample_mod=4
    )


def emb_pq_ivf_residual_topk(sf_dir: str) -> list[tuple]:
    # mirrors plans/corpus.py emb_pq_ivf_residual_topk: the residual-
    # IVFADC tier of the same composition
    return emb_pq_ivf_topk(sf_dir, residual=True)


def emb_cluster_balanced_sample(
    sf_dir: str, n_cells: int = 16, seed: int = 42
) -> list[tuple]:
    """Re-derive similarity.cluster_balanced_sample: emb_ann_ivf's
    centroid pick + assignment rule, then mixture_rebalance's DECLARED
    uniform-mixture math replayed in the engine's exact double order —
    t = 1.0/S, N' = min(n_s / t), keep_p = min(1.0, t * N' / n_s),
    keep iff md5-uniform(str(id)) < keep_p (hash_uniform: first 8 md5
    hex chars / 2^32, exact in double)."""
    ids, vecs = _load_embeddings(sf_dir)
    hs = [
        (spark_xxhash64(str(vid), Int32(seed)), vid, i)
        for i, vid in enumerate(ids)
    ]
    hs.sort()
    centroids = [vecs[i] for _, _, i in hs[:n_cells]]

    def cell_of(v: np.ndarray) -> int:
        return min((-_cosine(v, c), cell) for cell, c in enumerate(centroids))[1]

    assign = {ids[i]: cell_of(v) for i, v in enumerate(vecs)}
    counts: dict[int, int] = {}
    for cell in assign.values():
        counts[cell] = counts.get(cell, 0) + 1
    t = 1.0 / float(len(counts))
    n_prime = min(n / t for n in counts.values())
    keep_p = {
        cell: min(1.0, t * n_prime / n) for cell, n in counts.items()
    }
    out = []
    for vid in ids:
        u = (
            int(hashlib.md5(str(vid).encode()).hexdigest()[:8], 16)
            / float(1 << 32)
        )
        if u < keep_p[assign[vid]]:
            out.append((vid, assign[vid]))
    return sorted(out)


DERIVATIONS = {
    "emb_semdedup": emb_semdedup,
    "emb_prototype_prune": emb_prototype_prune,
    "s17_warc_domain_quality": s17_warc_domain_quality,
    "docs_incremental_dedup": docs_incremental_dedup,
    "s14_warc_scan": s14_warc_scan,
    "s15_warc_html_pipeline": s15_warc_html_pipeline,
    "s16_warc_domain_stats": s16_warc_domain_stats,
    "emb_pq_topk": emb_pq_topk,
    "emb_pq_rerank_topk": emb_pq_rerank_topk,
    "emb_pq_ivf_topk": emb_pq_ivf_topk,
    "emb_pq_ivf_residual_topk": emb_pq_ivf_residual_topk,
    "emb_pq_ivf_refined_topk": emb_pq_ivf_refined_topk,
    "emb_cluster_balanced_sample": emb_cluster_balanced_sample,
    "docs_minhash_lsh_dedup": docs_minhash_lsh_dedup,
    "docs_minhash_keep": docs_minhash_keep,
    "docs_simhash_pairs": docs_simhash_pairs,
    "emb_ann_lsh": emb_ann_lsh,
    "emb_ann_ivf": emb_ann_ivf,
    "emb_ann_ivf_refined": emb_ann_ivf_refined,
    "emb_lsh_near_dup": emb_lsh_near_dup,
    "s1_ctlog_scan": s1_ctlog_scan,
    "mm_extract_features": mm_extract_features,
    "mm_sample_frames": mm_sample_frames,
}


# ------------------------------------------------------------------ tokenizer
# BPE re-derivations from the DECLARED semantics in operators/tokenizer.py's
# module docstring, with deliberately different algorithms: training is the
# naive O(V)-per-round full pair recount (the engine maintains incremental
# pair statistics + an inverted index), and encoding is the min-rank
# iterative formulation (the engine applies merges in training order) — so
# a bookkeeping bug on either side fails the pin gate.

_BPE_END = "</w>"


def _bpe_merge_ltr(seq: tuple, pair: tuple) -> tuple:
    """Left-to-right non-overlapping merge of adjacent pair -> concat."""
    a, b = pair
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return tuple(out)


def _bpe_capped_freq(sf_dir: str, top_v: int = 8192) -> dict:
    texts = _read(sf_dir, "documents").column("text").to_pylist()
    freq: dict[str, int] = {}
    for t in texts:
        for w in _tokens(t or ""):
            if w:
                freq[w] = freq.get(w, 0) + 1
    items = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:top_v]
    return dict(items)


def _bpe_train_naive(
    freq: dict, n_merges: int = 60, min_count: int = 2
) -> list[tuple]:
    seqs = {w: tuple(w) + (_BPE_END,) for w in freq}
    merges: list[tuple] = []
    for _ in range(n_merges):
        stats: dict[tuple, int] = {}
        for w, n in freq.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                stats[p] = stats.get(p, 0) + n
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        merges.append(best[0])
        for w in seqs:
            seqs[w] = _bpe_merge_ltr(seqs[w], best[0])
    return merges


def _bpe_encode_minrank(word: str, ranks: dict) -> list:
    """Repeatedly merge ALL occurrences of the present pair with the
    lowest rank (a merge's output symbol only feeds later-rank merges,
    so this equals in-order application)."""
    seq: tuple = tuple(word) + (_BPE_END,)
    while len(seq) > 1:
        best_pair, best_rank = None, None
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_pair, best_rank = (seq[i], seq[i + 1]), r
        if best_pair is None:
            break
        seq = _bpe_merge_ltr(seq, best_pair)
    return list(seq)


def docs_bpe_vocab(sf_dir: str, n_merges: int = 60) -> list[tuple]:
    merges = _bpe_train_naive(_bpe_capped_freq(sf_dir), n_merges=n_merges)
    return sorted((i, a, b, a + b) for i, (a, b) in enumerate(merges))


def docs_bpe_token_stats(sf_dir: str, n_merges: int = 60) -> list[tuple]:
    tbl = _read(sf_dir, "documents")
    doc_ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    merges = _bpe_train_naive(_bpe_capped_freq(sf_dir), n_merges=n_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    memo: dict[str, int] = {}
    rows = []
    for did, t in zip(doc_ids, texts):
        t = t or ""
        n_tok = 0
        for w in _tokens(t):
            if not w:
                continue
            if w not in memo:
                memo[w] = len(_bpe_encode_minrank(w, ranks))
            n_tok += memo[w]
        n_chars = len(t)
        rows.append(
            (did, n_tok, n_chars, _round6(n_chars / max(n_tok, 1)))
        )
    return sorted(rows)


def docs_bpe_top_tokens(sf_dir: str, n_merges: int = 60) -> list[tuple]:
    texts = _read(sf_dir, "documents").column("text").to_pylist()
    merges = _bpe_train_naive(_bpe_capped_freq(sf_dir), n_merges=n_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    memo: dict[str, list] = {}
    counts: dict[str, int] = {}
    for t in texts:
        for w in _tokens(t or ""):
            if not w:
                continue
            if w not in memo:
                memo[w] = _bpe_encode_minrank(w, ranks)
            for tok in memo[w]:
                counts[tok] = counts.get(tok, 0) + 1
    head = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:40]
    return sorted(head)


DERIVATIONS.update(
    {
        "docs_bpe_vocab": docs_bpe_vocab,
        "docs_bpe_token_stats": docs_bpe_token_stats,
        "docs_bpe_top_tokens": docs_bpe_top_tokens,
    }
)


# ------------------------------------------------------------------ regression
# Re-derivation of the one-pass linear fit from the DECLARED semantics in
# operators/regression.py: exact integer moments, exact-rational solve of
# the normal equations, HALF_UP rounding at the edge. Deliberately
# different algorithm: Cramer determinants here vs the engine's Gaussian
# elimination — exact rationals make both produce the identical solution,
# so a moment-expression or elimination bug on either side fails the pin.

from fractions import Fraction as _Fr


def _ridge_rows(sf_dir: str) -> list[tuple]:
    tbl = _read(sf_dir, "documents")
    rows = []
    for did, text in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        t = text or ""
        words = [w for w in _tokens(t) if w]
        rows.append((did, len(t), len(words), len(set(words))))
    return rows


def _det3(m: list[list[int]]) -> int:
    return (
        m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
        - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
        + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
    )


def _ridge_solve(sf_dir: str):
    """Cramer solve of the 3x3 OLS system. Returns (w: list[Fraction],
    r2: Fraction, n, rows)."""
    rows = _ridge_rows(sf_dir)
    n = len(rows)
    s = {}
    for _, y, x1, x2 in rows:
        cols = (1, x1, x2, y)
        for i in range(4):
            for j in range(i, 4):
                s[(i, j)] = s.get((i, j), 0) + cols[i] * cols[j]

    def m(i: int, j: int) -> int:
        return s[(i, j)] if (i, j) in s else s[(j, i)]

    a = [[m(i, j) for j in range(3)] for i in range(3)]
    b = [m(i, 3) for i in range(3)]
    det = _det3(a)
    w = []
    for c in range(3):
        ac = [[b[i] if j == c else a[i][j] for j in range(3)] for i in range(3)]
        w.append(_Fr(_det3(ac), det))
    yy = _Fr(m(3, 3))
    wxy = sum(wi * _Fr(b[i]) for i, wi in enumerate(w))
    wgw = sum(
        w[i] * w[j] * _Fr(a[i][j]) for i in range(3) for j in range(3)
    )
    sse = yy - 2 * wxy + wgw
    sy = _Fr(m(0, 3))
    sst = yy - sy * sy / _Fr(n)
    r2 = _Fr(0) if sst == 0 else 1 - sse / sst
    return w, r2, n, rows


def _half_up_int(fr: _Fr) -> int:
    """Nearest integer, ties away from zero (BigDecimal HALF_UP)."""
    num, den = fr.numerator, fr.denominator
    neg = num < 0
    num = -num if neg else num
    q = (2 * num + den) // (2 * den)
    return -q if neg else q


def _fr_round6(fr: _Fr) -> float:
    return _half_up_int(fr * 10**6) / 10**6


def docs_ridge_fit(sf_dir: str) -> list[tuple]:
    w, r2, n, _ = _ridge_solve(sf_dir)
    rows = [
        ("intercept", _fr_round6(w[0])),
        ("x_words", _fr_round6(w[1])),
        ("x_distinct", _fr_round6(w[2])),
        ("__r2__", _fr_round6(r2)),
        ("__n__", float(n)),
    ]
    return sorted(rows)


def docs_ridge_scores(sf_dir: str) -> list[tuple]:
    w, _, _, rows = _ridge_solve(sf_dir)
    w_int = [_half_up_int(wi * 10**6) for wi in w]
    out = []
    for did, y, x1, x2 in rows:
        pred = float(w_int[0] + w_int[1] * x1 + w_int[2] * x2) / 1e6
        out.append((did, float(y), pred, _round6(y - pred)))
    return sorted(out)


DERIVATIONS.update(
    {
        "docs_ridge_fit": docs_ridge_fit,
        "docs_ridge_scores": docs_ridge_scores,
    }
)


def _bpe_vocab_map(sf_dir: str) -> tuple[dict, list]:
    freq = _bpe_capped_freq(sf_dir)
    merges = _bpe_train_naive(freq)
    alphabet = {c for w in freq for c in w} | {_BPE_END}
    vocab: dict[str, int] = {}
    for s in sorted(alphabet):
        vocab[s] = len(vocab)
    for a, b in merges:
        if a + b not in vocab:
            vocab[a + b] = len(vocab)
    return vocab, merges


def docs_bpe_vocab_ids(sf_dir: str) -> list[tuple]:
    vocab, _ = _bpe_vocab_map(sf_dir)
    return sorted((tid, tok) for tok, tid in vocab.items())


def docs_bpe_token_ids(sf_dir: str) -> list[tuple]:
    vocab, merges = _bpe_vocab_map(sf_dir)
    ranks = {p: i for i, p in enumerate(merges)}
    tbl = _read(sf_dir, "documents")
    memo: dict[str, list] = {}
    out = []
    for did, t in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        if did % 25 != 0:
            continue
        pos = 0
        for w in _tokens(t or ""):
            if not w:
                continue
            if w not in memo:
                memo[w] = [
                    vocab.get(tok, -1)
                    for tok in _bpe_encode_minrank(w, ranks)
                ]
            for tid in memo[w]:
                out.append((did, pos, tid))
                pos += 1
    return sorted(out)


DERIVATIONS.update(
    {
        "docs_bpe_vocab_ids": docs_bpe_vocab_ids,
        "docs_bpe_token_ids": docs_bpe_token_ids,
    }
)
