"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with sidecar
metadata columns; decode / feature-extract / resize / frame-sample are
actor-pool ``map_batches`` stages (decoder state loaded once per actor).

Four decoder modes:

- ``decoder="png"`` is a REAL decode path: a pure-stdlib PNG codec
  (``functions/png``: zlib + numpy unfiltering, all five scanline filters,
  8-bit gray/RGB/GA/RGBA) — no external library needed.
- ``decoder="jpeg"`` is a REAL decode path too: a pure-numpy baseline
  sequential JFIF codec (``functions/jpeg``: Annex-K tables, 8x8 DCT,
  Huffman, 4:4:4) — the format most of a real web corpus arrives in.
- ``decoder="real"`` (WebP/ffmpeg/soundfile formats) raises
  ``NotImplementedError`` at actor construction — those libraries are NOT
  in this container, so that seam stays an explicit stub.
- ``decoder="fake"`` is a deterministic stand-in that parses the payload's
  16-byte FakeImage header — the cheapest way to exercise the Ray-side
  plumbing (schema, batch sizing for fat rows, actor signature, output
  layout) in tests.

Fake payload layout: ``b"FIMG" | uint32 width | uint32 height | uint32
channels | pixel bytes``.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

_MAGIC = b"FIMG"
_HEADER = struct.Struct("<4sIII")


def encode_fake_image(width: int, height: int, channels: int = 3,
                      seed: int = 0) -> bytes:
    rng = np.random.RandomState(seed)
    pixels = rng.randint(0, 256, width * height * channels, dtype=np.int64).astype(np.uint8)
    return _HEADER.pack(_MAGIC, width, height, channels) + pixels.tobytes()


class DecodeImage:
    """Actor-pool stage: binary payload -> (width, height, channels,
    mean_luma) metadata columns.

    Use ``map_batches(DecodeImage, fn_constructor_kwargs={"decoder": "fake"},
    batch_size=small, concurrency=N)`` — payload rows are fat, so batches
    must stay small enough that batch x concurrency fits worker heaps.
    """

    def __init__(self, decoder: str = "real", payload_col: str = "payload"):
        self.payload_col = payload_col
        if decoder == "real":
            raise NotImplementedError(
                "WebP/AVIF decoding requires PIL/turbojpeg, not present in "
                "this environment — use decoder='png', decoder='jpeg' or "
                "decoder='gif' (built-in stdlib codecs, functions/png + "
                "functions/jpeg + functions/gif) or decoder='fake' "
                "(deterministic header parser)")
        if decoder not in ("fake", "png", "jpeg", "gif"):
            raise ValueError(f"unknown decoder {decoder!r}")
        if decoder == "png":
            from ..functions.png import decode_png
            self._decode = decode_png
        elif decoder == "jpeg":
            from ..functions.jpeg import decode_jpeg
            self._decode = decode_jpeg
        elif decoder == "gif":
            from ..functions.gif import decode_gif
            self._decode = decode_gif
        else:
            self._decode = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, channels, lumas = [], [], [], []
        for payload in batch[self.payload_col].to_pylist():
            if self._decode is not None:
                arr = self._decode(payload)
                h, w, c = arr.shape
                px = arr.reshape(-1)
            else:
                magic, w, h, c = _HEADER.unpack_from(payload, 0)
                if magic != _MAGIC:
                    raise ValueError("bad FakeImage payload")
                px = np.frombuffer(payload, np.uint8, offset=_HEADER.size)
            widths.append(w)
            heights.append(h)
            channels.append(c)
            lumas.append(float(px.mean()) if px.size else 0.0)
        out = batch.drop_columns([self.payload_col])
        out = out.append_column("width", pa.array(widths, pa.int32()))
        out = out.append_column("height", pa.array(heights, pa.int32()))
        out = out.append_column("channels", pa.array(channels, pa.int32()))
        out = out.append_column("mean_luma", pa.array(lumas, pa.float64()))
        return out


class DHashImage:
    """Actor-pool stage: image payload -> 64-bit difference hash (dHash),
    the standard cheap perceptual fingerprint for image NEAR-dup detection
    (near-identical images differ in a few bits; exact dups collide).

    Frozen spec (mirrored literal-for-literal by the SQL oracle, so it is
    exactly reproducible anywhere):

    * gray plane = channel 0 of the decoded 8-bit image;
    * a 9x8 sample grid by integer floor division —
      ``x_i = (i*W)//9`` (i=0..8), ``y_j = (j*H)//8`` (j=0..7);
    * ``bit(j,i) = gray[y_j, x_{i+1}] > gray[y_j, x_i]`` (i=0..7);
    * bit index ``b = j*8 + i``; returned as two int64 halves
      (``dhash_lo`` bits 0-31, ``dhash_hi`` bits 32-63) to stay inside
      signed-64 arithmetic in every engine.

    Nearest-neighbor sampling (not area averaging) keeps the spec integer-
    exact; it is the dHash variant used when decode bandwidth dominates.
    """

    def __init__(self, decoder: str = "png", payload_col: str = "payload"):
        self.payload_col = payload_col
        if decoder == "png":
            from ..functions.png import decode_png
            self._decode = decode_png
        elif decoder == "jpeg":
            from ..functions.jpeg import decode_jpeg
            self._decode = decode_jpeg
        else:
            raise ValueError(f"DHashImage needs a real decoder, got {decoder!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        his, los = [], []
        for payload in batch[self.payload_col].to_pylist():
            arr = self._decode(payload)
            h, w = arr.shape[:2]
            gray = arr[:, :, 0].astype(np.int64)
            xs = (np.arange(9, dtype=np.int64) * w) // 9
            ys = (np.arange(8, dtype=np.int64) * h) // 8
            g = gray[np.ix_(ys, xs)]
            bits = (g[:, 1:] > g[:, :-1])
            lo = int((bits[:4].ravel().astype(np.int64)
                      << np.arange(32, dtype=np.int64)).sum())
            hi = int((bits[4:].ravel().astype(np.int64)
                      << np.arange(32, dtype=np.int64)).sum())
            los.append(lo)
            his.append(hi)
        out = batch.drop_columns([self.payload_col])
        out = out.append_column("dhash_hi", pa.array(his, pa.int64()))
        out = out.append_column("dhash_lo", pa.array(los, pa.int64()))
        return out


class DecodeAudio:
    """Actor-pool stage: audio payload -> integer-exact signal features.

    ``decoder="wav"`` is a REAL codec (stdlib ``wave``, RIFF PCM16) — the
    audio analogue of the PNG/JPEG upgrade: mp3/flac/ogg stay a documented
    ``NotImplementedError`` seam (no external audio libs in this
    environment).  Emitted features are chosen to be integer-exact so a
    SQL oracle can replay them from a synthetic waveform formula:

    * ``n_samples`` / ``sample_rate`` / ``duration_ms`` (= n*1000 // rate),
    * ``sum_sq`` — int64 sum of channel-0 squared samples (energy; RMS is
      ``sqrt(sum_sq/n)`` downstream, kept integer here for exactness),
    * ``zero_cross`` — count of sign boundaries ``(s[i] >= 0) != (s[i-1]
      >= 0)`` (the classic cheap voicing/noise discriminator).
    """

    def __init__(self, decoder: str = "wav", payload_col: str = "payload"):
        self.payload_col = payload_col
        if decoder != "wav":
            raise NotImplementedError(
                "mp3/flac/ogg decoding needs external codecs not present "
                "here — use decoder='wav' (stdlib RIFF PCM16)")

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io
        import wave

        ns, rates, durs, sums, zcs = [], [], [], [], []
        for payload in batch[self.payload_col].to_pylist():
            with wave.open(io.BytesIO(payload)) as w:
                rate = w.getframerate()
                n = w.getnframes()
                ch = w.getnchannels()
                if w.getsampwidth() != 2:
                    raise ValueError("DecodeAudio expects PCM16")
                raw = w.readframes(n)
            s = np.frombuffer(raw, "<i2")
            if ch > 1:
                s = s[::ch]  # channel 0 — mirrors DHashImage's gray plane
            s64 = s.astype(np.int64)
            ns.append(int(len(s)))
            rates.append(int(rate))
            durs.append(int(len(s)) * 1000 // int(rate))
            sums.append(int((s64 * s64).sum()))
            zcs.append(int(((s[1:] >= 0) != (s[:-1] >= 0)).sum()))
        out = batch.drop_columns([self.payload_col])
        out = out.append_column("n_samples", pa.array(ns, pa.int64()))
        out = out.append_column("sample_rate", pa.array(rates, pa.int64()))
        out = out.append_column("duration_ms", pa.array(durs, pa.int64()))
        out = out.append_column("sum_sq", pa.array(sums, pa.int64()))
        out = out.append_column("zero_cross", pa.array(zcs, pa.int64()))
        return out


class ResampleAudio:
    """Actor-pool stage: integer-factor audio DOWNSAMPLE (decimation by
    block mean) over real WAV payloads — the rate-normalization step an
    audio-training pipeline runs before feature extraction (16 kHz
    models over mixed-rate crawls).

    Frozen spec, integer-exact so SQL can replay it: the PCM16 stream
    splits into non-overlapping blocks of ``factor`` samples (a trailing
    partial block DROPS), each output sample is ``floor(block_sum /
    factor)`` (true floor, negatives round down — SQL's
    ``floor(sum / factor·1.0)``).  Emitted: ``n_in, n_out, rate_out``
    and the exact int64 ``sum_out`` / ``sum_abs_out`` checksums of the
    resampled signal.  mp3/flac stay the documented seam
    (:class:`DecodeAudio`)."""

    def __init__(self, factor: int = 2, payload_col: str = "payload"):
        if factor < 1:
            raise ValueError("factor must be >= 1")
        self.factor = factor
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io
        import wave

        f = self.factor
        n_in, n_out, rates, sums, sabs = [], [], [], [], []
        for payload in batch[self.payload_col].to_pylist():
            with wave.open(io.BytesIO(payload)) as w:
                rate = w.getframerate()
                n = w.getnframes()
                ch = w.getnchannels()
                if w.getsampwidth() != 2:
                    raise ValueError("ResampleAudio expects PCM16")
                raw = w.readframes(n)
            s = np.frombuffer(raw, "<i2")
            if ch > 1:
                s = s[::ch]
            m = (len(s) // f) * f
            blocks = s[:m].astype(np.int64).reshape(-1, f)
            out = np.floor_divide(blocks.sum(axis=1), f)
            n_in.append(int(len(s)))
            n_out.append(int(len(out)))
            rates.append(int(rate) // f)
            sums.append(int(out.sum()))
            sabs.append(int(np.abs(out).sum()))
        o = batch.drop_columns([self.payload_col])
        o = o.append_column("n_in", pa.array(n_in, pa.int64()))
        o = o.append_column("n_out", pa.array(n_out, pa.int64()))
        o = o.append_column("rate_out", pa.array(rates, pa.int64()))
        o = o.append_column("sum_out", pa.array(sums, pa.int64()))
        o = o.append_column("sum_abs_out", pa.array(sabs, pa.int64()))
        return o


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples -> RIFF PCM16 WAV bytes (stdlib writer)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.ascontiguousarray(samples, "<i2").tobytes())
    return buf.getvalue()


_VMAGIC = b"FVID"
_VHEADER = struct.Struct("<4sIIII")  # magic, n_frames, width, height, channels


def encode_fake_video(n_frames: int, width: int, height: int,
                      channels: int = 1, seed: int = 0) -> bytes:
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, n_frames * width * height * channels,
                     dtype=np.int64).astype(np.uint8)
    return _VHEADER.pack(_VMAGIC, n_frames, width, height, channels) + px.tobytes()


class SampleFrames:
    """Actor-pool stage: video payload -> every ``stride``-th frame as a
    FakeImage payload row (``flat_map``-shaped: output has more rows than
    input).  Same real/fake decoder seam as DecodeImage."""

    def __init__(self, stride: int = 2, decoder: str = "real",
                 payload_col: str = "payload", id_col: str = "doc_id"):
        self.stride = max(1, stride)
        self.payload_col = payload_col
        self.id_col = id_col
        if decoder == "real":
            raise NotImplementedError("real frame sampling needs ffmpeg; "
                                      "use decoder='fake'")
        if decoder != "fake":
            raise ValueError(f"unknown decoder {decoder!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, frame_idx, frames = [], [], []
        ids = batch[self.id_col].to_pylist()
        for vid, payload in zip(ids, batch[self.payload_col].to_pylist()):
            magic, n, w, h, c = _VHEADER.unpack_from(payload, 0)
            if magic != _VMAGIC:
                raise ValueError("bad FakeVideo payload")
            px = np.frombuffer(payload, np.uint8, offset=_VHEADER.size) \
                .reshape(n, h, w, c)
            for fi in range(0, n, self.stride):
                ids_out.append(vid)
                frame_idx.append(fi)
                frames.append(_HEADER.pack(_MAGIC, w, h, c) + px[fi].tobytes())
        return pa.table({
            self.id_col: pa.array(ids_out),
            "frame_idx": pa.array(frame_idx, pa.int32()),
            "payload": pa.array(frames, pa.binary()),
        })


class ResizeImage:
    """Actor-pool resize stage: nearest-neighbor subsample to ``target``.

    ``decoder="png"`` / ``decoder="jpeg"`` decode/re-encode real payloads
    with the built-in stdlib codecs (``functions/png``, ``functions/jpeg``);
    ``decoder="fake"`` operates on FakeImage headers; WebP/AVIF stay the
    explicit NotImplementedError seam."""

    def __init__(self, target: tuple[int, int] = (64, 64), decoder: str = "real",
                 payload_col: str = "payload"):
        self.target = target
        self.payload_col = payload_col
        if decoder == "real":
            raise NotImplementedError(
                "WebP/AVIF resize needs an image library; use decoder='png' "
                "or decoder='jpeg' (built-in codecs) or decoder='fake'")
        if decoder not in ("fake", "png", "jpeg"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self._real = decoder in ("png", "jpeg")
        if decoder == "png":
            from ..functions.png import decode_png, encode_png
            self._decode, self._encode = decode_png, encode_png
        elif decoder == "jpeg":
            from ..functions.jpeg import decode_jpeg, encode_jpeg
            self._decode, self._encode = decode_jpeg, encode_jpeg

    def __call__(self, batch: pa.Table) -> pa.Table:
        tw, th = self.target
        out_payloads = []
        for payload in batch[self.payload_col].to_pylist():
            if self._real:
                px = self._decode(payload)
                h, w, c = px.shape
            else:
                _, w, h, c = _HEADER.unpack_from(payload, 0)
                px = np.frombuffer(payload, np.uint8,
                                   offset=_HEADER.size).reshape(h, w, c)
            ys = (np.arange(th) * h) // th
            xs = (np.arange(tw) * w) // tw
            resized = px[ys][:, xs]
            out_payloads.append(
                self._encode(resized) if self._real
                else _HEADER.pack(_MAGIC, tw, th, c) + resized.tobytes())
        return batch.set_column(batch.column_names.index(self.payload_col),
                                self.payload_col,
                                pa.array(out_payloads, pa.binary()))


class SpectralFeatures:
    """Actor-pool stage: WAV payload -> framed-STFT spectral features.

    A REAL windowed FFT path (``numpy.fft.rfft`` over ``frame`` -sample
    frames at ``hop`` spacing — the standard STFT front end of every
    audio featurizer), with an integer-exact surface so a SQL oracle can
    check it: per doc it emits ``n_samples``, ``n_frames`` (=
    ``(n - frame) // hop + 1``), and ``peak_bin`` — the modal per-frame
    argmax of the magnitude spectrum excluding DC.  For a stationary
    tone at an exact bin frequency every frame's argmax IS that bin
    (int16 quantization noise sits ~60 dB below the peak), so a wrong
    decode, frame size, hop, or FFT breaks the integer surface.
    """

    def __init__(self, frame: int = 256, hop: int = 128,
                 payload_col: str = "payload"):
        self.frame = frame
        self.hop = hop
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io
        import wave

        ns, nf, pk = [], [], []
        for payload in batch[self.payload_col].to_pylist():
            with wave.open(io.BytesIO(payload)) as w:
                n = w.getnframes()
                ch = w.getnchannels()
                if w.getsampwidth() != 2:
                    raise ValueError("SpectralFeatures expects PCM16")
                raw = w.readframes(n)
            s = np.frombuffer(raw, "<i2")
            if ch > 1:
                s = s[::ch]
            ns.append(int(s.size))
            if s.size < self.frame:
                nf.append(0)
                pk.append(-1)
                continue
            k = (s.size - self.frame) // self.hop + 1
            idx = (np.arange(k)[:, None] * self.hop
                   + np.arange(self.frame))
            frames = s[idx].astype(np.float64)
            mag = np.abs(np.fft.rfft(frames, axis=1))
            mag[:, 0] = 0.0                    # exclude DC
            bins = mag.argmax(axis=1)
            vals, counts = np.unique(bins, return_counts=True)
            # modal bin; ties (never hit by the stationary-tone oracle)
            # break to the lowest bin deterministically
            nf.append(int(k))
            pk.append(int(vals[counts.argmax()]))
        out = batch.drop_columns([self.payload_col])
        out = out.append_column("n_samples", pa.array(ns, pa.int64()))
        out = out.append_column("n_frames", pa.array(nf, pa.int64()))
        out = out.append_column("peak_bin", pa.array(pk, pa.int64()))
        return out
