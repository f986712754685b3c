"""Audio binary-column operators — the third modality of the multimodal
layer (images/video in operators.images).

Audio lives inside tables as an opaque ``binary`` column with typed
metadata, exactly like the reference's ``image_bytes`` model
(TrainDatasets.py:134): decode and feature extraction run as
Arrow-batched ``mapInPandas`` over the column, so schema, batching, and
partitioning are the real 100 TB plumbing even though the codec is a
stand-in.

Codec strategy: this container has no soundfile/librosa, so samples use
the deterministic **FAUD fake codec** (magic ``FAUD`` + u32 sample rate
+ u32 sample count + int16 PCM payload). Real WAV/MP3/FLAC bytes are
rejected with a clearly-marked ``NotImplementedError`` — swapping
``decode_audio``/``encode_audio`` for soundfile-backed versions is the
only production change; every Spark-side signature stays put.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

FAUD_MAGIC = b"FAUD"
_AHEADER = struct.Struct(">4sII")  # magic, sample_rate, n_samples

# Real-codec seam, mirroring operators.images: soundfile is selected by
# import-availability. When present, real WAV/FLAC/OGG bytes decode;
# when absent (this container), they are detected and rejected with the
# documented NotImplementedError while FAUD keeps the Spark plumbing
# exercisable. tests/test_audio.py::test_real_codec_seam asserts
# whichever branch the environment provides.
try:  # pragma: no cover - environment-dependent branch
    import soundfile as _soundfile

    HAS_SOUNDFILE = True
except ImportError:  # pragma: no cover
    _soundfile = None
    HAS_SOUNDFILE = False


def encode_audio(samples: np.ndarray, sample_rate: int, fmt: str = "faud") -> bytes:
    """int16 PCM → blob. ``fmt='faud'`` is the deterministic stand-in;
    ``'wav'``/``'flac'`` use soundfile when available."""
    pcm = np.asarray(samples, dtype=">i2")
    if fmt == "faud":
        return _AHEADER.pack(FAUD_MAGIC, sample_rate, len(pcm)) + pcm.tobytes()
    if not HAS_SOUNDFILE:
        raise NotImplementedError(
            f"STUB: encoding {fmt!r} requires soundfile, which is not "
            "installed in this container. FAUD is the available fallback."
        )
    import io

    buf = io.BytesIO()
    _soundfile.write(
        buf, np.asarray(samples, dtype=np.int16), sample_rate, format=fmt.upper()
    )
    return buf.getvalue()


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Audio blob → (int16 samples, sample_rate). FAUD decodes natively;
    real containers decode via soundfile when available and raise the
    documented NotImplementedError otherwise."""
    head = bytes(data[: _AHEADER.size])
    if head[:4] != FAUD_MAGIC:
        if head[:4] in (b"RIFF", b"fLaC", b"OggS") or head[:3] == b"ID3":
            if HAS_SOUNDFILE:
                import io

                samples, rate = _soundfile.read(
                    io.BytesIO(bytes(data)), dtype="int16"
                )
                if samples.ndim > 1:  # downmix to mono, reference-style
                    samples = samples.mean(axis=1).astype(np.int16)
                return samples, int(rate)
            raise NotImplementedError(
                "real audio codecs unavailable here — swap decode_audio "
                "for a soundfile-backed implementation in production"
            )
        raise ValueError("not a FAUD blob")
    _, rate, n = _AHEADER.unpack(head)
    samples = np.frombuffer(bytes(data), dtype=">i2", offset=_AHEADER.size, count=n)
    return samples.astype(np.int16), rate


def audio_frame_features(
    df: DataFrame,
    frame_len: int,
    hop: int | None = None,
    audio_col: str = "audio_bytes",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Windowed feature extraction: explode each clip into
    (id_cols..., frame_idx, rms, zero_crossings, n_samples) rows — the
    framing step of any audio pipeline (VAD, quality gating, dedup).

    All frames of one clip are computed in a single numpy reshape per
    row (no per-frame Python); clips fan out inside ``mapInPandas``, so
    the operator parallelizes over rows like every other binary-column
    op. The trailing partial frame is dropped (standard framing).
    """
    hop = hop or frame_len
    id_cols = id_cols or [c for c in df.columns if c != audio_col]
    schema = StructType(
        [f for f in df.schema.fields if f.name in id_cols]
        + [
            StructField("frame_idx", IntegerType()),
            StructField("rms", DoubleType()),
            StructField("zero_crossings", LongType()),
            StructField("n_samples", IntegerType()),
        ]
    )
    out_cols = [*id_cols, "frame_idx", "rms", "zero_crossings", "n_samples"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                samples, _rate = decode_audio(row[audio_col])
                n_frames = (
                    0
                    if len(samples) < frame_len
                    else 1 + (len(samples) - frame_len) // hop
                )
                if n_frames == 0:
                    continue
                idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_len)
                frames = samples[idx].astype(np.float64)
                rms = np.sqrt((frames**2).mean(axis=1))
                signs = np.sign(frames)
                signs[signs == 0] = 1
                zc = (np.diff(signs, axis=1) != 0).sum(axis=1)
                ids = tuple(row[c] for c in id_cols)
                for i in range(n_frames):
                    rows.append(
                        ids + (i, float(rms[i]), int(zc[i]), frame_len)
                    )
            yield pd.DataFrame(rows, columns=out_cols)

    return df.mapInPandas(gen, schema=schema)
