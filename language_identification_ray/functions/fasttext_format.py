"""From-scratch reader/writer + numpy inference for the PUBLIC fastText
supervised model format (``.bin`` and product-quantized ``.ftz``).

The reference's hot-path detector is the real lid.176 fastText model
(``fasttext_wrapper.py:25-45``); the fasttext wheel is not installable in
this environment, so this module implements the file format and the
prediction math directly from the published format (magic 793712314,
version 12 — the fastText 0.9.x on-disk layout: args block, dictionary
with NUL-terminated entries, optional prune index, dense or
product-quantized input/output matrices) so the engine can load and run
the reference's actual ``lid.176.ftz`` — and any other fastText
supervised model — with numpy only.  The mirrored semantics, all from the
public format/algorithm description:

- FNV-1a token hashing WITH the signed-char quirk (bytes >= 0x80
  sign-extend before the xor) — required for subword/bucket parity;
- UTF-8-aware character n-gram subwords over ``<word>`` (``minn..maxn``,
  continuation bytes glued to their lead byte), including the
  whole-word-token exclusion rule for 1-grams at the boundaries;
- word-ngram hashing with the int32→uint64 sign-extension quirk;
- dictionary prune remapping (``.ftz`` files ship a pruned bucket space);
- product-quantizer decode (per-subspace uint8 codes × 256 centroids,
  optional per-row norm quantizer) for quantized matrices;
- prediction for softmax AND hierarchical-softmax losses (the Huffman
  tree is rebuilt from the stored label counts exactly like training
  did), with fastText's ``log(x + 1e-5)`` score smoothing.

Writing supports dense (non-quantized) models, which is what the in-repo
trainer (``scripts/train_fasttext_model.py``) emits — a real fastText
binary would load the produced file.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

MAGIC = 793712314
VERSION = 12
EOS = b"</s>"
BOW = b"<"
EOW = b">"
LOSS_HS, LOSS_NS, LOSS_SOFTMAX, LOSS_OVA = 1, 2, 3, 4
MODEL_CBOW, MODEL_SG, MODEL_SUP = 1, 2, 3
_KSUB = 256  # fastText product quantizer: 256 centroids per subspace
_LOG_EPS = 1e-5  # fastText std_log(x) = log(x + 1e-5)
_DELIMS = b" \n\t\v\f\r\x00"

_ARG_NAMES = (
    "dim", "ws", "epoch", "min_count", "neg", "word_ngrams", "loss",
    "model", "bucket", "minn", "maxn", "lr_update_rate",
)


def ft_hash(data: bytes) -> int:
    """fastText's FNV-1a with the signed-char sign-extension quirk:
    each byte is read as int8, then converted to uint32."""
    h = 2166136261
    for b in data:
        if b >= 128:
            b -= 256  # int8 view
        h = (h ^ (b & 0xFFFFFFFF)) & 0xFFFFFFFF
        h = (h * 16777619) & 0xFFFFFFFF
    return h


def compute_subwords(word: bytes, minn: int, maxn: int) -> List[int]:
    """Raw (pre-prune, pre-bucket-offset) subword hashes of ``word``
    (already BOW/EOW-wrapped): UTF-8-aware char n-grams, n in
    [minn, maxn], skipping the lone whole-1-gram at either boundary."""
    out: List[int] = []
    nbytes = len(word)
    for i in range(nbytes):
        if (word[i] & 0xC0) == 0x80:
            continue  # continuation byte: not a char start
        j, n = i, 1
        ngram = bytearray()
        while j < nbytes and n <= maxn:
            ngram.append(word[j])
            j += 1
            while j < nbytes and (word[j] & 0xC0) == 0x80:
                ngram.append(word[j])
                j += 1
            if n >= minn and not (n == 1 and (i == 0 or j == nbytes)):
                out.append(ft_hash(bytes(ngram)))
            n += 1
    return out


@dataclass
class FastTextArgs:
    dim: int = 16
    ws: int = 5
    epoch: int = 5
    min_count: int = 1
    neg: int = 5
    word_ngrams: int = 1
    loss: int = LOSS_SOFTMAX
    model: int = MODEL_SUP
    bucket: int = 2000000
    minn: int = 2
    maxn: int = 4
    lr_update_rate: int = 100
    t: float = 1e-4
    qout: bool = False


class _QuantMatrix:
    """Product-quantized matrix: per-row uint8 codes into 256-centroid
    subspace codebooks, optional per-row scalar norm codebook."""

    def __init__(self, m, n, codes, centroids, nsubq, dsub, lastdsub,
                 norms: Optional[np.ndarray],
                 norm_flat: Optional[np.ndarray] = None,
                 norm_codes: Optional[np.ndarray] = None):
        self.m, self.n = m, n
        self.codes = codes  # (m, nsubq) uint8
        self.nsubq, self.dsub, self.lastdsub = nsubq, dsub, lastdsub
        self.flat = centroids  # (dim * 256,) float32, dim == n
        # reshape centroids into per-subspace lookup tables
        flat = centroids
        tabs = []
        for sq in range(nsubq):
            d = lastdsub if sq == nsubq - 1 else dsub
            off = sq * _KSUB * dsub
            tabs.append(flat[off:off + _KSUB * d].reshape(_KSUB, d))
        self._tabs = tabs
        self.norms = norms  # (m,) float32 or None
        # raw norm-quantizer parts kept so a loaded/constructed quantized
        # matrix can be re-serialized without a side-channel
        self.norm_flat = norm_flat
        self.norm_codes = norm_codes

    def rows(self, idx: np.ndarray) -> np.ndarray:
        """Decode rows ``idx`` -> (len(idx), n) float32."""
        c = self.codes[idx]  # (k, nsubq)
        parts = [self._tabs[sq][c[:, sq]] for sq in range(self.nsubq)]
        out = np.concatenate(parts, axis=1).astype(np.float32)
        if self.norms is not None:
            out *= self.norms[idx][:, None]
        return out


class _DenseMatrix:
    def __init__(self, data: np.ndarray):
        self.data = data
        self.m, self.n = data.shape

    def rows(self, idx: np.ndarray) -> np.ndarray:
        return self.data[idx]


def _read_exact(f, n: int) -> bytes:
    b = f.read(n)
    if len(b) != n:
        raise ValueError("truncated fastText model file")
    return b


def _load_pq(f) -> Tuple[np.ndarray, int, int, int]:
    dim, nsubq, dsub, lastdsub = struct.unpack("<4i", _read_exact(f, 16))
    cents = np.frombuffer(_read_exact(f, dim * _KSUB * 4), dtype="<f4").copy()
    return cents, nsubq, dsub, lastdsub


def _load_matrix(f, quant: bool):
    if not quant:
        m, n = struct.unpack("<2q", _read_exact(f, 16))
        data = np.frombuffer(_read_exact(f, m * n * 4), dtype="<f4").copy()
        return _DenseMatrix(data.reshape(m, n))
    qnorm = _read_exact(f, 1)[0] != 0
    m, n = struct.unpack("<2q", _read_exact(f, 16))
    (codesize,) = struct.unpack("<i", _read_exact(f, 4))
    codes = np.frombuffer(_read_exact(f, codesize), dtype=np.uint8).copy()
    cents, nsubq, dsub, lastdsub = _load_pq(f)
    norms = None
    nflat = ncodes = None
    if qnorm:
        ncodes = np.frombuffer(_read_exact(f, m), dtype=np.uint8).copy()
        nflat, _, _, _ = _load_pq(f)  # dim=1 quantizer: 256 scalars
        norms = nflat[:_KSUB][ncodes].astype(np.float32)
    return _QuantMatrix(m, n, codes.reshape(m, nsubq), cents, nsubq, dsub,
                        lastdsub, norms, nflat, ncodes)


class FastTextModel:
    """A loaded fastText supervised model, ready for numpy prediction."""

    def __init__(self, args: FastTextArgs,
                 words: List[Tuple[bytes, int, int]],
                 nwords: int, nlabels: int, ntokens: int,
                 input_matrix, output_matrix,
                 pruneidx: Optional[Dict[int, int]] = None,
                 pruneidx_size: int = -1):
        self.args = args
        self.words = words  # (word_bytes, count, type) in dict order
        self.nwords, self.nlabels, self.ntokens = nwords, nlabels, ntokens
        self.input, self.output = input_matrix, output_matrix
        self.pruneidx = pruneidx or {}
        self.pruneidx_size = pruneidx_size
        self.word2id: Dict[bytes, int] = {w: i for i, (w, _, _) in enumerate(words)}
        self.labels: List[str] = [
            w.decode("utf-8", "replace").replace("__label__", "")
            for w, _, _ in words[nwords:]
        ]
        self._sub_cache: Dict[int, np.ndarray] = {}
        self._oov_cache: Dict[bytes, np.ndarray] = {}
        self._hs_paths = None
        if args.loss == LOSS_HS:
            self._hs_paths = self._build_hs_paths()

    # -- dictionary / feature extraction ----------------------------------

    def _push_hash(self, out: List[int], hid: int) -> None:
        if self.pruneidx_size == 0:
            return
        if self.pruneidx_size > 0:
            hid = self.pruneidx.get(hid, -1)
            if hid < 0:
                return
        out.append(self.nwords + hid)

    def _subword_ids(self, wid: int) -> np.ndarray:
        """In-vocab word: [wid] + its (pruned, offset) subword ids."""
        cached = self._sub_cache.get(wid)
        if cached is not None:
            return cached
        word = self.words[wid][0]
        ids = [wid]
        if self.args.maxn > 0 and word != EOS:
            for h in compute_subwords(BOW + word + EOW,
                                      self.args.minn, self.args.maxn):
                self._push_hash(ids, h % self.args.bucket)
        arr = np.asarray(ids, dtype=np.int64)
        self._sub_cache[wid] = arr
        return arr

    def _oov_ids(self, token: bytes) -> np.ndarray:
        cached = self._oov_cache.get(token)
        if cached is not None:
            return cached
        ids: List[int] = []
        if self.args.maxn > 0 and token != EOS:
            for h in compute_subwords(BOW + token + EOW,
                                      self.args.minn, self.args.maxn):
                self._push_hash(ids, h % self.args.bucket)
        arr = np.asarray(ids, dtype=np.int64)
        if len(self._oov_cache) < 65536:
            self._oov_cache[token] = arr
        return arr

    def input_ids(self, text: str) -> np.ndarray:
        """Token stream -> input-matrix row ids, exactly like supervised
        getLine: vocab words expand to word+subwords, OOV words to
        subwords only, word-ngram hashes appended last (with the
        int32→uint64 sign-extension quirk)."""
        raw = text.encode("utf-8", "replace")
        # fastText splits on space/\n/\t/\v/\f/\r/\0; bytes.split() covers
        # the ASCII-whitespace six, NUL is split out separately
        tokens = [t for t in raw.split() if t]
        if b"\x00" in raw:
            tokens = [p for t in tokens for p in t.split(b"\x00") if p]
        tokens.append(EOS)
        parts: List[np.ndarray] = []
        hashes: List[int] = []
        for tok in tokens:
            wid = self.word2id.get(tok, -1)
            is_label = (tok.startswith(b"__label__") if wid < 0
                        else self.words[wid][2] == 1)
            if is_label:
                continue
            if wid >= 0:
                if self.args.maxn <= 0:
                    parts.append(np.asarray([wid], dtype=np.int64))
                else:
                    parts.append(self._subword_ids(wid))
            else:
                parts.append(self._oov_ids(tok))
            hashes.append(ft_hash(tok))
        if self.args.word_ngrams > 1:
            ng: List[int] = []
            # hashes are stored as int32 in fastText, then widened to
            # uint64 WITH sign extension before the rolling multiply
            h32 = [h - (1 << 32) if h >= (1 << 31) else h for h in hashes]
            for i in range(len(h32)):
                h = h32[i] & 0xFFFFFFFFFFFFFFFF
                for j in range(i + 1, min(i + self.args.word_ngrams, len(h32))):
                    h = (h * 116049371 + (h32[j] & 0xFFFFFFFFFFFFFFFF)) \
                        & 0xFFFFFFFFFFFFFFFF
                    self._push_hash(ng, h % self.args.bucket)
            if ng:
                parts.append(np.asarray(ng, dtype=np.int64))
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.concatenate(parts)

    # -- prediction --------------------------------------------------------

    def _build_hs_paths(self):
        """Rebuild the Huffman tree from stored label counts (same
        construction as training) and flatten each leaf's root path into
        (row-index array, sign array) for vectorized scoring."""
        counts = [c for _, c, t in self.words[self.nwords:]]
        osz = self.nlabels
        parent = [-1] * (2 * osz - 1)
        binary = [False] * (2 * osz - 1)
        cnt = [int(c) for c in counts] + [int(1e15)] * (osz - 1)
        leaf, node = osz - 1, osz
        for i in range(osz, 2 * osz - 1):
            mini = [0, 0]
            for j in range(2):
                if leaf >= 0 and cnt[leaf] < cnt[node]:
                    mini[j] = leaf
                    leaf -= 1
                else:
                    mini[j] = node
                    node += 1
            cnt[i] = cnt[mini[0]] + cnt[mini[1]]
            parent[mini[0]] = i
            parent[mini[1]] = i
            binary[mini[1]] = True
        paths = []
        for lbl in range(osz):
            rows, signs = [], []
            n = lbl
            while parent[n] != -1:
                p = parent[n]
                rows.append(p - osz)  # internal node -> output row
                signs.append(1.0 if binary[n] else -1.0)
                n = p
            paths.append((np.asarray(rows, dtype=np.int64),
                          np.asarray(signs, dtype=np.float32)))
        return paths

    def hidden(self, text: str) -> Optional[np.ndarray]:
        ids = self.input_ids(text)
        if len(ids) == 0:
            return None
        rows = self.input.rows(ids)
        return (rows.sum(axis=0, dtype=np.float32)
                * np.float32(1.0 / len(ids)))

    def label_log_probs(self, text: str) -> Optional[np.ndarray]:
        """Full per-label log-probability vector (fastText's smoothed
        scores: softmax -> log(p + 1e-5); hs -> sum of log(σ(±f)+1e-5))."""
        h = self.hidden(text)
        if h is None:
            return None
        if self.args.loss == LOSS_HS:
            nint = self.nlabels - 1
            f = self.output.rows(np.arange(nint)) @ h  # internal-node dots
            sig = 1.0 / (1.0 + np.exp(-f.astype(np.float64)))
            out = np.empty(self.nlabels, dtype=np.float64)
            for lbl, (rows, signs) in enumerate(self._hs_paths):
                p = np.where(signs > 0, sig[rows], 1.0 - sig[rows])
                out[lbl] = np.log(p.astype(np.float64) + _LOG_EPS).sum()
            return out
        scores = (self.output.rows(np.arange(self.nlabels)) @ h).astype(np.float64)
        if self.args.loss == LOSS_SOFTMAX:
            scores -= scores.max()
            p = np.exp(scores)
            p /= p.sum()
            return np.log(p + _LOG_EPS)
        if self.args.loss in (LOSS_OVA, LOSS_NS):
            # both inherit fastText's BinaryLogisticLoss::computeOutput:
            # independent per-label sigmoids, no normalization
            return np.log(1.0 / (1.0 + np.exp(-scores)) + _LOG_EPS)
        raise ValueError(f"unsupported loss {self.args.loss}")

    def predict(self, text: str, k: int = 1,
                threshold: float = 0.0) -> List[Tuple[str, float]]:
        """Top-``k`` (label, prob) like fasttext's ``model.predict`` (sans
        the ``__label__`` prefix); empty list when no token maps to any
        input row (the wheel's behavior for unknown-charset text)."""
        lp = self.label_log_probs(text)
        if lp is None:
            return []
        order = np.argsort(-lp, kind="stable")
        out = []
        for i in order[: (len(lp) if k < 0 else k)]:
            p = float(np.exp(lp[i]))
            if p < threshold:
                break
            out.append((self.labels[i], p))
        return out

    # -- serialization -----------------------------------------------------

    @classmethod
    def load(cls, path: str) -> "FastTextModel":
        with open(path, "rb") as f:
            magic, version = struct.unpack("<2i", _read_exact(f, 8))
            if magic != MAGIC:
                raise ValueError(f"not a fastText model (magic {magic})")
            if version > VERSION:
                raise ValueError(f"unsupported fastText version {version}")
            ints = struct.unpack("<12i", _read_exact(f, 48))
            (t,) = struct.unpack("<d", _read_exact(f, 8))
            args = FastTextArgs(**dict(zip(_ARG_NAMES, ints)), t=t)
            if version == 11 and args.model == MODEL_SUP:
                args.maxn = 0  # fastText back-compat rule
            size, nwords, nlabels = struct.unpack("<3i", _read_exact(f, 12))
            ntokens, prune_size = struct.unpack("<2q", _read_exact(f, 16))
            words: List[Tuple[bytes, int, int]] = []
            buf = bytearray()
            for _ in range(size):
                buf.clear()
                while True:
                    c = _read_exact(f, 1)
                    if c == b"\x00":
                        break
                    buf += c
                (count,) = struct.unpack("<q", _read_exact(f, 8))
                (wtype,) = struct.unpack("<b", _read_exact(f, 1))
                words.append((bytes(buf), count, wtype))
            pruneidx: Dict[int, int] = {}
            for _ in range(max(prune_size, 0)):
                a, b = struct.unpack("<2i", _read_exact(f, 8))
                pruneidx[a] = b
            quant_input = _read_exact(f, 1)[0] != 0
            inp = _load_matrix(f, quant_input)
            qout = _read_exact(f, 1)[0] != 0
            args.qout = qout
            outp = _load_matrix(f, quant_input and qout)
        return cls(args, words, nwords, nlabels, ntokens, inp, outp,
                   pruneidx, prune_size)

    def save(self, path: str) -> None:
        """Write the dense (non-quantized) format; a real fastText binary
        loads the result.  Quantized models are load-only."""
        if not isinstance(self.input, _DenseMatrix) or not isinstance(
                self.output, _DenseMatrix):
            raise ValueError("only dense models can be saved")
        a = self.args
        with open(path, "wb") as f:
            f.write(struct.pack("<2i", MAGIC, VERSION))
            f.write(struct.pack(
                "<12i", a.dim, a.ws, a.epoch, a.min_count, a.neg,
                a.word_ngrams, a.loss, a.model, a.bucket, a.minn, a.maxn,
                a.lr_update_rate))
            f.write(struct.pack("<d", a.t))
            f.write(struct.pack("<3i", len(self.words), self.nwords,
                                self.nlabels))
            f.write(struct.pack("<2q", self.ntokens, self.pruneidx_size))
            for w, count, wtype in self.words:
                f.write(w + b"\x00")
                f.write(struct.pack("<q", count))
                f.write(struct.pack("<b", wtype))
            for kk in sorted(self.pruneidx):
                f.write(struct.pack("<2i", kk, self.pruneidx[kk]))
            f.write(b"\x00")  # quant_input = false
            f.write(struct.pack("<2q", self.input.m, self.input.n))
            f.write(np.ascontiguousarray(self.input.data, dtype="<f4").tobytes())
            f.write(b"\x00")  # qout = false
            f.write(struct.pack("<2q", self.output.m, self.output.n))
            f.write(np.ascontiguousarray(self.output.data, dtype="<f4").tobytes())


def new_dense_model(args: FastTextArgs,
                    vocab: Sequence[Tuple[bytes, int]],
                    labels: Sequence[Tuple[bytes, int]],
                    ntokens: int,
                    rng: np.random.Generator) -> FastTextModel:
    """Fresh trainable dense model: fastText's init (input uniform in
    ±1/dim, output zeros).  ``vocab``/``labels`` are (token, count),
    already sorted words-first / count-desc like Dictionary::threshold."""
    words = [(w, c, 0) for w, c in vocab] + [(l, c, 1) for l, c in labels]
    n_in = len(vocab) + args.bucket
    inp = _DenseMatrix(rng.uniform(-1.0 / args.dim, 1.0 / args.dim,
                                   size=(n_in, args.dim)).astype(np.float32))
    outp = _DenseMatrix(np.zeros((len(labels), args.dim), dtype=np.float32))
    return FastTextModel(args, words, len(vocab), len(labels), ntokens,
                         inp, outp)


def _train_pq(rows: np.ndarray, dsub: int, seed: int,
              iters: int = 12) -> Tuple[np.ndarray, int, int, int]:
    """Per-subspace 256-centroid k-means (the fastText product quantizer's
    layout): returns (flat centroids, nsubq, dsub, lastdsub) matching
    ProductQuantizer's on-disk shape.  Deterministic (seeded)."""
    m, dim = rows.shape
    nsubq = (dim + dsub - 1) // dsub
    lastdsub = dim - (nsubq - 1) * dsub or dsub
    rng = np.random.default_rng(seed)
    flat = np.zeros(dim * _KSUB, dtype=np.float32)
    for sq in range(nsubq):
        d = lastdsub if sq == nsubq - 1 else dsub
        lo = sq * dsub
        X = rows[:, lo:lo + d].astype(np.float32)
        if m >= _KSUB:
            C = X[rng.choice(m, _KSUB, replace=False)].copy()
        else:
            C = X[rng.integers(0, m, _KSUB)].copy()
        for _ in range(iters):
            a = np.argmin(
                ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
                if m * _KSUB * d <= 2_000_000
                else np.stack([((X - c) ** 2).sum(-1) for c in C], 1),
                axis=1,
            )
            for k in range(_KSUB):
                sel = a == k
                if sel.any():
                    C[k] = X[sel].mean(axis=0)
        off = sq * _KSUB * dsub
        flat[off:off + _KSUB * d] = C.reshape(-1)
    return flat, nsubq, dsub, lastdsub


def _pq_encode(rows: np.ndarray, flat: np.ndarray, nsubq: int, dsub: int,
               lastdsub: int) -> np.ndarray:
    codes = np.empty((len(rows), nsubq), dtype=np.uint8)
    for sq in range(nsubq):
        d = lastdsub if sq == nsubq - 1 else dsub
        off = sq * _KSUB * dsub
        C = flat[off:off + _KSUB * d].reshape(_KSUB, d)
        X = rows[:, sq * dsub:sq * dsub + d]
        c2 = (C ** 2).sum(1)[None, :]  # loop-invariant centroid norms
        # chunked nearest-centroid to bound the distance matrix
        for i in range(0, len(X), 65536):
            xb = X[i:i + 65536]
            d2 = (xb ** 2).sum(1)[:, None] - 2.0 * xb @ C.T + c2
            codes[i:i + 65536, sq] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def quantize_model(model: FastTextModel, dsub: int = 2, qnorm: bool = True,
                   seed: int = 7) -> FastTextModel:
    """Product-quantize a dense model's INPUT matrix (the fastText
    ``quantize`` recipe sans cutoff/retrain: optional per-row norm
    codebook + per-subspace 256-centroid codes over the normalized rows).
    The output matrix stays dense (``qout`` false, the usual setting).
    Returns a NEW model whose ``save`` emits a loadable ``.ftz``-style
    quantized file."""
    if not isinstance(model.input, _DenseMatrix):
        raise ValueError("model input is already quantized")
    rows = model.input.data.astype(np.float32)
    norms = None
    if qnorm:
        norms = np.linalg.norm(rows, axis=1).astype(np.float32)
        safe = np.where(norms == 0, 1.0, norms)
        rows = rows / safe[:, None]
    flat, nsubq, dsub_, lastdsub = _train_pq(rows, dsub, seed)
    codes = _pq_encode(rows, flat, nsubq, dsub_, lastdsub)
    nflat = ncodes1 = None
    if qnorm:
        nflat, _, _, _ = _train_pq(norms[:, None].astype(np.float32), 1, seed + 1)
        ncodes1 = _pq_encode(norms[:, None].astype(np.float32), nflat, 1, 1, 1)[:, 0]
    qm = _QuantMatrix(model.input.m, model.input.n, codes, flat, nsubq,
                      dsub_, lastdsub,
                      nflat[:_KSUB][ncodes1].astype(np.float32)
                      if qnorm else None,
                      nflat, ncodes1)
    return FastTextModel(model.args, model.words, model.nwords, model.nlabels,
                         model.ntokens, qm, model.output,
                         dict(model.pruneidx), model.pruneidx_size)


def _save_pq(f, flat: np.ndarray, nsubq: int, dsub: int, lastdsub: int,
             dim: int) -> None:
    f.write(struct.pack("<4i", dim, nsubq, dsub, lastdsub))
    f.write(np.ascontiguousarray(flat[:dim * _KSUB], dtype="<f4").tobytes())


def save_quantized(model: FastTextModel, path: str) -> None:
    """Write the quantized-input format (quant_input=true, dense output).
    Works for models produced by :func:`quantize_model` AND for loaded
    quantized files (the loader keeps the raw codebooks)."""
    qm = model.input
    if not isinstance(qm, _QuantMatrix):
        raise ValueError("quantize_model() first (input matrix is dense)")
    if not isinstance(model.output, _DenseMatrix):
        raise ValueError("qout (quantized output) models cannot be re-saved")
    qnorm = qm.norm_codes is not None
    codes, flat = qm.codes, qm.flat
    nsubq, dsub, lastdsub = qm.nsubq, qm.dsub, qm.lastdsub
    a = model.args
    with open(path, "wb") as f:
        f.write(struct.pack("<2i", MAGIC, VERSION))
        f.write(struct.pack(
            "<12i", a.dim, a.ws, a.epoch, a.min_count, a.neg,
            a.word_ngrams, a.loss, a.model, a.bucket, a.minn, a.maxn,
            a.lr_update_rate))
        f.write(struct.pack("<d", a.t))
        f.write(struct.pack("<3i", len(model.words), model.nwords,
                            model.nlabels))
        f.write(struct.pack("<2q", model.ntokens, model.pruneidx_size))
        for w, count, wtype in model.words:
            f.write(w + b"\x00")
            f.write(struct.pack("<q", count))
            f.write(struct.pack("<b", wtype))
        for kk in sorted(model.pruneidx):
            f.write(struct.pack("<2i", kk, model.pruneidx[kk]))
        f.write(b"\x01")  # quant_input = true
        f.write(b"\x01" if qnorm else b"\x00")
        f.write(struct.pack("<2q", qm.m, qm.n))
        f.write(struct.pack("<i", codes.size))
        f.write(np.ascontiguousarray(codes, dtype=np.uint8).tobytes())
        _save_pq(f, flat, nsubq, dsub, lastdsub, qm.n)
        if qnorm:
            f.write(np.ascontiguousarray(qm.norm_codes, dtype=np.uint8).tobytes())
            _save_pq(f, qm.norm_flat, 1, 1, 1, 1)
        f.write(b"\x00")  # qout = false
        f.write(struct.pack("<2q", model.output.m, model.output.n))
        f.write(np.ascontiguousarray(model.output.data, dtype="<f4").tobytes())
