"""Track gap-fill interpolation (SURVEY.md §2.5 W4-W6) as applyInPandas.

Re-expresses the reference's keyframe interpolation
(CvatApi.py:427-731, itself derived from the MIT-licensed CVAT
dataset_manager) with a numpy kernel distributed per track:

- consecutive keyframe pairs fan out one synthetic polygon per
  intermediate frame (W4);
- polygons with different vertex counts are matched by normalized
  arc-length position along the closed ring, then the interpolated ring
  is thinned segment-by-segment with the source curve's density threshold
  (len/2n) — the same matching/reduction semantics as CVAT;
- the last keyframe propagates to ``end_frame`` unless marked outside
  (W5); attributes carry forward to keyframes that miss a spec_id (W6);
- outside non-keyframes are excluded, frames clamped to
  [track_frame, end_frame).

Spark shape: ``groupBy(track keys).applyInPandas`` — each track is an
independent sequential algorithm (the irreducible Python core), but
tracks themselves distribute perfectly; the shuffle is keyed on
(job_id, track_id), which is fine-grained enough to balance 1000
executors at datalake scale.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

TRACK_SHAPE_SCHEMA = StructType(
    [
        StructField("track_id", LongType()),
        StructField("frame", IntegerType()),
        StructField("points", ArrayType(DoubleType())),
        StructField("outside", BooleanType()),
        StructField("keyframe", BooleanType()),
    ]
)


# ---------------------------------------------------------------------------
# numpy kernel
# ---------------------------------------------------------------------------

def _arc_offsets(ring: np.ndarray) -> np.ndarray:
    """Cumulative arc length of a point ring, normalized to [0, 1]."""
    seg = np.linalg.norm(np.diff(ring, axis=0), axis=1)
    total = seg.sum()
    out = np.zeros(len(ring))
    if total > 0:
        out[1:] = np.cumsum(seg) / total
    return out


def _nearest(values: np.ndarray, targets: np.ndarray) -> np.ndarray:
    """Index of the nearest target for each value (ties → first/lowest,
    matching a linear min-scan)."""
    d = np.abs(values[:, None] - targets[None, :])
    return d.argmin(axis=1)


def _match_rings(left_off: np.ndarray, right_off: np.ndarray) -> list[list[int]]:
    """CVAT arc-length matching: every left vertex takes its nearest right
    vertex; right vertices left unmatched are attached to their nearest
    left vertex; match lists are sorted."""
    matching: list[list[int]] = [[j] for j in _nearest(left_off, right_off)]
    matched = {j for m in matching for j in m}
    unmatched = [j for j in range(len(right_off)) if j not in matched]
    if unmatched:
        owners = _nearest(right_off[unmatched], left_off)
        for j, i in zip(unmatched, owners):
            matching[i].append(j)
    return [sorted(m) for m in matching]


def _ring_length(ring: np.ndarray) -> float:
    return float(np.linalg.norm(np.diff(ring, axis=0), axis=1).sum())


def _thin_run(
    pts: np.ndarray, start: int, stop: int, base_length: float, n: int
) -> list[np.ndarray]:
    """Greedy thinning of pts[start..stop]: keep points at least
    base_length/(2n) apart; a 2-point result closer than the threshold
    collapses to its midpoint (CVAT minimize_segment)."""
    if start == stop:
        return [pts[start]]
    threshold = base_length / (2 * n)
    kept = [pts[start]]
    last = start
    for i in range(start + 1, stop):
        if np.linalg.norm(pts[i] - pts[last]) >= threshold:
            kept.append(pts[i])
            last = i
    kept.append(pts[stop])
    if len(kept) == 2 and np.linalg.norm(pts[stop] - pts[start]) < threshold:
        return [(pts[start] + pts[stop]) / 2]
    return kept


def interpolate_ring(
    left: np.ndarray, right: np.ndarray, offset: float
) -> np.ndarray:
    """One interpolated open polygon between two closed-ring inputs.

    ``left``/``right`` are (n, 2) arrays WITHOUT the closing vertex; the
    ring closure, matching, lerp, and thinning mirror CvatApi.py:464-662.
    Returns an (m, 2) array (m may differ from both inputs, as in CVAT).
    """
    lring = np.vstack([left, left[:1]])
    rring = np.vstack([right, right[:1]])
    loff = _arc_offsets(lring)
    roff = _arc_offsets(rring)
    matching = _match_rings(loff, roff)

    interp: list[np.ndarray] = []
    idx_of_left: list[list[int]] = []
    for i, matches in enumerate(matching):
        idx_of_left.append(
            list(range(len(interp), len(interp) + len(matches)))
        )
        for j in matches:
            interp.append(lring[i] + (rring[j] - lring[i]) * offset)
    pts = np.asarray(interp)

    # Segment-wise reduction: runs of single-matched left vertices thin by
    # the left curve's density; multi-matched vertices thin by the right's.
    reduced: list[np.ndarray] = []
    open_start: int | None = None

    def close_left_run(start: int, stop: int) -> None:
        a, b = idx_of_left[start][0], idx_of_left[stop][0]
        if a == b:
            reduced.append(pts[a])
            return
        base = _ring_length(lring[start : stop + 1])
        reduced.extend(_thin_run(pts, a, b, base, stop - start + 1))

    for i, matches in enumerate(matching):
        if len(matches) == 1:
            if open_start is not None and matches[0] == matching[open_start][0]:
                continue
            if open_start is not None:
                close_left_run(open_start, i - 1)
            open_start = i
        else:
            if open_start is not None:
                close_left_run(open_start, i - 1)
                open_start = None
            base = _ring_length(rring[matches[0] : matches[-1] + 1])
            reduced.extend(
                _thin_run(
                    pts,
                    idx_of_left[i][0],
                    idx_of_left[i][-1],
                    base,
                    matches[-1] - matches[0] + 1,
                )
            )
    if open_start is not None:
        close_left_run(open_start, len(matching) - 1)

    out = np.asarray(reduced)
    # Drop the interpolated closing vertex (reference removes the two
    # extra coords it appended; CvatApi.py:655-661).
    return out[:-1] if len(out) > 1 else out


def interpolate_track(
    shapes: Iterable[dict], end_frame: int, track_frame: int = 0
) -> list[dict]:
    """Dense per-frame shapes for one track (CvatApi.py:664-731).

    ``shapes``: dicts with frame:int, points:list[float], outside:bool.
    Returns dicts with an added keyframe flag; frames clamped to
    [track_frame, end_frame); outside non-keyframes excluded.
    """
    ordered = sorted(shapes, key=lambda s: s["frame"])
    out: list[dict] = []
    prev: dict | None = None

    def lerp_frames(a: dict, b: dict) -> list[dict]:
        res = []
        left = np.asarray(a["points"], dtype=np.float64).reshape(-1, 2)
        right = np.asarray(b["points"], dtype=np.float64).reshape(-1, 2)
        span = b["frame"] - a["frame"]
        for fr in range(a["frame"] + 1, b["frame"]):
            ring = interpolate_ring(left, right, (fr - a["frame"]) / span)
            res.append(
                {
                    "frame": fr,
                    "points": ring.reshape(-1).tolist(),
                    "outside": a["outside"],
                    "keyframe": False,
                }
            )
        return res

    for shape in ordered:
        shape = {**shape, "keyframe": True}
        if prev is not None and end_frame <= shape["frame"]:
            # interpolate into the tail, keep frames below end_frame
            # (CvatApi.py:676-693)
            tail = lerp_frames(prev, shape) + [shape]
            out.extend(s for s in tail if s["frame"] < end_frame)
            prev = shape
            break
        if prev is not None and not prev["outside"]:
            out.extend(lerp_frames(prev, shape))
        out.append(shape)
        prev = shape

    if prev is not None and not prev["outside"]:
        for fr in range(prev["frame"] + 1, end_frame):
            out.append({**prev, "frame": fr, "keyframe": False})

    return [
        s
        for s in out
        if track_frame <= s["frame"] < end_frame
        and (s["keyframe"] or not s["outside"])
    ]


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

def interpolate_tracks(
    df: DataFrame,
    end_frame: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Gap-fill every track: input rows are keyframes
    (group_cols..., track_id, frame, points, outside); output is the
    dense frame sequence with keyframe flags.

    Shape: repartition by track key + sortWithinPartitions + mapInPandas,
    with a pandas groupby inside the batch. One Arrow batch carries MANY
    tracks, so the per-group overhead of applyInPandas (one tiny pandas
    frame per track — milliseconds each, hours at 10^7 tracks) is
    amortized to one crossing per batch; per-track work itself is the
    irreducible sequential kernel.

    The repartition pins an explicit partition count: this stage is
    CPU-bound Python, so parallelism must track cores, not bytes — left
    to AQE, a few MB of keyframes coalesce into ONE partition and the
    whole kernel runs on a single thread.
    """
    group_cols = group_cols or []
    keys = [*group_cols, "track_id"]
    out_cols = [*group_cols, "track_id", "frame", "points", "outside", "keyframe"]
    out_schema = StructType(
        [f for f in df.schema.fields if f.name in group_cols]
        + TRACK_SHAPE_SCHEMA.fields
    )

    def fill_batches(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out_rows: list[tuple] = []
            for key, grp in pdf.groupby(keys, sort=False):
                key = key if isinstance(key, tuple) else (key,)
                prefix = key[:-1] + (key[-1],)  # (group_cols..., track_id)
                shapes = [
                    {
                        "frame": int(r.frame),
                        "points": list(r.points),
                        "outside": bool(r.outside),
                    }
                    for r in grp.itertuples()
                ]
                for s in interpolate_track(shapes, end_frame):
                    out_rows.append(
                        prefix
                        + (s["frame"], s["points"], s["outside"], s["keyframe"])
                    )
            yield pd.DataFrame(out_rows, columns=out_cols)

    n_parts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    partitioned = df.repartition(n_parts, *keys).sortWithinPartitions(
        *keys, "frame"
    )
    return partitioned.mapInPandas(fill_batches, schema=out_schema)


def carry_forward_attributes(df: DataFrame, spec_cols: list[str]) -> DataFrame:
    """W6 as a pure window op: per (track_id, spec column), the last
    non-null value at or before each frame (CvatApi.py:700-703)."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("track_id")
        .orderBy("frame")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in spec_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out
