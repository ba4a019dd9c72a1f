"""Streaming SOURCE over Iceberg v2 tables: ``spark.readStream
.format("iceberg_stream").load(path)`` tails the snapshot log the way
iceberg-spark's streaming read does — offsets are SNAPSHOT positions
in sequence-number order, each micro-batch reads exactly the data
files ADDED by the snapshots in ``(start, end]``, and checkpoint
restart resumes from the last committed snapshot.

Same architecture as :mod:`.delta_source` (Spark 4 Python Data Source
API): driver-side ``partitions()`` diffs the ACTIVE FILE SETS of
consecutive snapshots — pure-Python metadata work, no session needed
— and ships one :class:`InputPartition` per newly-added data file;
executor-side ``read()`` opens that parquet file with pyarrow.  Data
files in Iceberg physically contain their partition columns, so no
value injection is needed.

Semantics (iceberg-spark parity):

- append-only tails: a snapshot that REMOVES active data files
  (overwrite, delete, rewrite/compaction) refuses by default;
  ``ignoreChanges=true`` streams its newly-added files anyway
  (consumers dedupe by key).  Compaction is indistinguishable from an
  overwrite at the file level here because Iceberg carries no
  per-file dataChange flag — the honest default is therefore refusal,
  where the Delta source can stay silent;
- position-delete snapshots (new delete files, data files untouched)
  also REFUSE by default: their row removals are invisible to an
  append-level stream, and iceberg-spark likewise fails on delete
  snapshots unless ``streaming-skip-delete-snapshots`` is set —
  ``ignoreChanges=true`` is this source's equivalent skip switch;
- ``readChangeFeed=true`` (r8) switches to the row-level CHANGELOG
  tail (:class:`IcebergChangesStreamReader`): micro-batches emit the
  change set of the planned snapshot range (schema +
  ``_change_type`` + ``_commit_snapshot_pos``) matching the batch
  ``read_iceberg_changes`` — added files stream as inserts, removed
  files as previous-state deletes (their prior position AND equality
  deletes subtracted executor-side), NEW position-delete files as
  exactly the newly-dead rows, and NEW equality-delete files (r9) as
  the carried rows their keys kill under the spec's sequence gate.
  This goes BEYOND iceberg-spark, whose streaming read is
  append-only.  Equality-delete key files of ANY size stream (r11):
  tasks consult key files one at a time (r10) in bounded
  ``maxEqDeleteRows``-row batches (pyarrow ``iter_batches``), so
  per-task key residency is one chunk regardless of file shape — the
  r10 oversized-single-file refusal is gone.
"""

from __future__ import annotations

import os
import urllib.parse

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from ..sources.iceberg import (
    _current_schema,
    _load_metadata,
    _manifest_entries,
    _resolution,
    _schema_to_spark,
)


class _IceFilePartition(InputPartition):
    def __init__(
        self, file_path: str, names: list[str], resolve: dict | None,
        consts: dict | None = None,
    ) -> None:
        self.file_path = file_path
        self.names = names
        #: rename-resolution tables for tables whose schema history
        #: shows a rename (see sources.iceberg._resolution): id →
        #: current name, unambiguous history name → id, ambiguous
        #: names.  None for never-renamed tables (by-name fast path).
        self.resolve = resolve
        #: identity-partition constants for THIS file (typed values,
        #: spec §Column Projection) — converted/migrated tables'
        #: referenced files LACK the columns; reading them by name
        #: would silently NULL-fill (r10 review finding).
        self.consts = consts or {}


def _ordered_snapshots(meta: dict) -> list[dict]:
    return sorted(
        meta.get("snapshots") or [],
        key=lambda s: (s.get("sequence-number", 0), s.get("timestamp-ms", 0)),
    )


def _active_files(path: str, meta: dict, snap: dict) -> tuple[set, set]:
    data, deletes, eq_deletes = _manifest_entries(path, meta, snap)
    # equality deletes count as delete files: a snapshot that adds one is
    # a delete/upsert snapshot and triggers the same refusal gate
    return (
        {r["path"] for r in data},
        {r["path"] for r in deletes} | {r["path"] for r in eq_deletes},
    )


def _start_offset(options, path: str, start_pos: int) -> dict:
    """Anchored initial offset: ``startingSnapshotId`` (iceberg-spark's
    ``start-snapshot-id`` — the tail begins AFTER that snapshot)
    resolves to its log position; otherwise ``start_pos`` (a plain
    position, 0 = genesis).  Both anchor the snapshot id at pos-1 so
    expiry-shifted logs refuse loudly instead of re-reading."""
    sid_opt = options.get("startingsnapshotid")
    snaps = _ordered_snapshots(_load_metadata(path))
    if sid_opt is not None:
        want = int(sid_opt)
        for i, s in enumerate(snaps):
            if int(s["snapshot-id"]) == want:
                return {"pos": i + 1, "sid": s["snapshot-id"]}
        raise ValueError(
            f"iceberg_stream: startingSnapshotId {want} is not in the "
            "snapshot log (expired, or never existed)"
        )
    if start_pos >= 1:
        if start_pos > len(snaps):
            raise ValueError(
                f"iceberg_stream: startingPos {start_pos} is past the "
                "snapshot log"
            )
        return {"pos": start_pos, "sid": snaps[start_pos - 1]["snapshot-id"]}
    return {"pos": 0, "sid": None}


class IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("iceberg_stream requires .load(<table path>)")
        self.ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        self.options = options
        self.schema = schema

    def initialOffset(self) -> dict:
        return _start_offset(self.options, self.path, 0)

    def latestOffset(self) -> dict:
        meta = _load_metadata(self.path)
        snaps = _ordered_snapshots(meta)
        # offsets ANCHOR their position to the snapshot id at pos-1:
        # snapshot expiry shifts log positions, and a restart that
        # silently re-interpreted an old position against the shifted
        # log would re-read or skip snapshots — a misread.  The anchor
        # turns that into the loud refusal below.
        return {
            "pos": len(snaps),
            "sid": snaps[-1]["snapshot-id"] if snaps else None,
        }

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["pos"]), int(end["pos"])
        meta = _load_metadata(self.path)
        snaps = _ordered_snapshots(meta)
        if hi > len(snaps):
            raise ValueError(
                "iceberg_stream: offset past the snapshot log (snapshots "
                "were expired?) — the stream's starting snapshot is no "
                "longer available; restart from a fresh checkpoint"
            )
        sid = start.get("sid")
        if lo >= 1 and sid is not None and (
            snaps[lo - 1]["snapshot-id"] != sid
        ):
            raise ValueError(
                "iceberg_stream: the checkpoint's starting snapshot "
                f"{sid} is no longer in the snapshot log (expired?) — "
                "the positions after it have shifted; restart from a "
                "fresh checkpoint"
            )
        names = [f.name for f in self.schema.fields]
        res = _resolution(meta)
        resolve = None
        if res is not None:
            # Map each STREAM column (schema pinned at stream start,
            # possibly pre-rename) to its field id: current schema
            # first, then the history's unambiguous name→id map.
            cur_by_name = {f["name"]: int(f["id"]) for f in res["ordered"]}
            ids = {}
            for n in names:
                fid = cur_by_name.get(n, res["name_to_id"].get(n))
                if fid is not None:
                    ids[int(fid)] = n
            resolve = {
                "ids": ids,
                "name_to_id": res["name_to_id"],
                "ambiguous": sorted(res["ambiguous"]),
            }
        # converted/migrated provenance: the referenced files LACK
        # their identity partition columns — ship typed constants per
        # added file (spec §Column Projection); native tables skip the
        # plan (their files contain the columns, by-name reads stand)
        const_files: dict = {}
        if (meta.get("properties") or {}).get("converted-from-delta") or (
            meta.get("properties") or {}
        ).get("migrated-data-files"):
            from ..sources.iceberg import (
                _current_schema as _cur,
                _identity_const_plan as _icp,
            )

            hi_snap = snaps[hi - 1] if hi >= 1 else None
            if hi_snap is not None:
                data, _d, _e = _manifest_entries(self.path, meta, hi_snap)
                if resolve is not None:
                    raise ValueError(
                        "iceberg_stream: renamed-column streaming on a "
                        "converted/migrated partitioned table is not "
                        "supported — read in batch (read_iceberg)"
                    )
                plan = _icp(meta, _cur(meta), data, typed=True)
                if plan is not None:
                    const_files = plan[1]
        out: list[_IceFilePartition] = []
        prev, prev_del = (
            _active_files(self.path, meta, snaps[lo - 1])
            if lo >= 1
            else (set(), set())
        )
        for i in range(lo, hi):
            cur, cur_del = _active_files(self.path, meta, snaps[i])
            changed = (prev - cur) or (cur_del - prev_del)
            if changed and not self.ignore_changes:
                raise ValueError(
                    f"iceberg_stream: snapshot {snaps[i]['snapshot-id']} "
                    f"({(snaps[i].get('summary') or {}).get('operation')}) "
                    "removes or position-deletes rows; streaming a change "
                    "as silence is wrong — set ignoreChanges=true to "
                    "stream only its added files (downstream must dedupe "
                    "by key)"
                )
            for p in sorted(cur - prev):
                up = urllib.parse.unquote(p)
                out.append(
                    _IceFilePartition(
                        up, names, resolve,
                        const_files.get(os.path.basename(up)),
                    )
                )
            prev, prev_del = cur, cur_del
        return out

    def read(self, partition: _IceFilePartition):
        import pyarrow.parquet as pq

        table = pq.read_table(partition.file_path)
        if partition.resolve is None:
            colmap = {n: n for n in table.column_names}
        else:
            # Renamed table: the file may spell OLD names — resolve by
            # parquet field id (same contract as the batch reader's
            # _resolved_union; silent NULLs for renamed columns would
            # be a misread, not a degradation).
            r = partition.resolve
            colmap = {}
            for fld in table.schema:
                raw = (fld.metadata or {}).get(b"PARQUET:field_id")
                if raw is not None:
                    fid = int(raw)
                else:
                    if fld.name in r["ambiguous"]:
                        raise ValueError(
                            f"iceberg_stream: cannot resolve column "
                            f"{fld.name!r}: no parquet field ids and the "
                            "name maps to multiple field ids across "
                            "schema history"
                        )
                    fid = r["name_to_id"].get(fld.name)
                cur = r["ids"].get(fid) if fid is not None else None
                if cur is not None:
                    colmap[cur] = fld.name
        consts = partition.consts
        for row in table.to_pylist():
            yield tuple(
                consts[n]
                if n in consts  # identity source: metadata wins
                else (row.get(colmap[n]) if n in colmap else None)
                for n in partition.names
            )

    def commit(self, end: dict) -> None:
        pass


def _colmap(table, resolve: dict | None) -> dict:
    """Current-name → file-column-name map for one pyarrow table OR
    schema, resolving renamed tables by parquet field id (same
    contract as the batch reader's _resolved_union — silent NULLs for
    renamed columns would be a misread)."""
    schema = table.schema if hasattr(table, "column_names") else table
    if resolve is None:
        return {n: n for n in schema.names}
    colmap: dict[str, str] = {}
    for fld in schema:
        raw = (fld.metadata or {}).get(b"PARQUET:field_id")
        if raw is not None:
            fid = int(raw)
        else:
            if fld.name in resolve["ambiguous"]:
                raise ValueError(
                    f"iceberg_stream: cannot resolve column {fld.name!r}: "
                    "no parquet field ids and the name maps to multiple "
                    "field ids across schema history"
                )
            fid = resolve["name_to_id"].get(fld.name)
        cur = resolve["ids"].get(fid) if fid is not None else None
        if cur is not None:
            colmap[cur] = fld.name
    return colmap


class _IceChangePartition(InputPartition):
    """One changelog unit of a planned snapshot range.  ``kind``:

    - ``ins``: a data file ADDED by the snapshot — live rows (the
      snapshot's OWN new position deletes subtracted, so an upsert's
      dead-on-arrival rows stay silent) are inserts;
    - ``del``: a data file REMOVED by the snapshot — its
      previous-state rows (prior position deletes and prior equality
      deletes subtracted) are deletes;
    - ``posdel``: a NEW position-delete file — exactly the
      newly-dead rows (minus previously-dead positions and
      eq-killed rows, same-snapshot equality deletes included) of
      data files active across the transition are deletes;
    - ``eqdel`` (r9): one CARRIED data file scanned against the
      snapshot's NEW equality-delete files — rows matching a new
      kill key (sequence gate: the delete's seq must exceed the data
      file's) that were not already position- or eq-dead are deletes.

    Descriptors ship file PATHS only (delete-file paths, equality
    descriptors as (path, seq, key column names), plus the
    metadata-sized carried path→seq map for ``posdel`` scoping); all
    parquet reads happen executor-side."""

    def __init__(
        self,
        kind: str,
        file_path: str,
        aux_paths: list[str],
        carried,
        snapshot_id: int,
        names: list[str],
        resolve: dict | None,
        eq_files: tuple = (),
        eq_excl: tuple = (),
        file_seq: int = 0,
    ) -> None:
        self.kind = kind
        self.file_path = file_path
        self.aux_paths = aux_paths
        self.carried = carried
        self.snapshot_id = snapshot_id
        self.names = names
        self.resolve = resolve
        #: equality-delete descriptors (path, seq, (key names…)) whose
        #: MATCHES this partition must EMIT (``eqdel`` only)
        self.eq_files = tuple(eq_files)
        #: equality-delete descriptors whose matches are ALREADY dead
        #: and must be excluded from the emission
        self.eq_excl = tuple(eq_excl)
        #: the data file's own sequence number (the spec's strict
        #: ``delete.seq > data.seq`` gate)
        self.file_seq = int(file_seq)
        #: identity-partition constants for THIS data file (typed,
        #: spec §Column Projection; converted/migrated tables only —
        #: the referenced files lack the columns), and the
        #: basename→constants map for posdel's carried files
        self.consts: dict | None = None
        self.consts_map: dict | None = None


class IcebergChangesStreamReader(DataSourceStreamReader):
    """Streaming row-level CHANGELOG tail (``readChangeFeed=true``):
    each micro-batch emits the change set of the planned snapshot
    range — the same contract as the batch
    :func:`~..sources.iceberg.read_iceberg_changes` — so
    delete/rewrite-carrying snapshots stream without loss instead of
    refusing.  Output = table columns + ``_change_type`` +
    ``_snapshot_id``.  Position deletes, appends, rewrites, AND
    equality-delete snapshots (r9, VERDICT r8 item #2 — the
    Flink-CDC-written shape) all stream: each ``eqdel`` task scans
    one carried data file against the snapshot's new kill-key files
    with the spec's strict sequence gate.  Key files are consulted
    ONE AT A TIME (r10, VERDICT r9 item #3) and, within a file, one
    bounded batch at a time (r11): ``maxEqDeleteRows`` (default 64k)
    is the chunk size, so per-task key residency is one chunk no
    matter how a CDC writer shaped its delete files — neither a long
    backlog of small files nor a single oversized file refuses."""

    def __init__(self, schema: StructType, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("iceberg_stream requires .load(<table path>)")
        self.options = options
        self.start_pos = int(options.get("startingpos", 0))
        self.schema = schema

    def initialOffset(self) -> dict:
        return _start_offset(self.options, self.path, self.start_pos)

    latestOffset = IcebergStreamReader.latestOffset

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["pos"]), int(end["pos"])
        meta = _load_metadata(self.path)
        snaps = _ordered_snapshots(meta)
        if hi > len(snaps):
            raise ValueError(
                "iceberg_stream: offset past the snapshot log (snapshots "
                "were expired?) — restart from a fresh checkpoint"
            )
        sid = start.get("sid")
        if lo >= 1 and sid is not None and (
            snaps[lo - 1]["snapshot-id"] != sid
        ):
            raise ValueError(
                "iceberg_stream: the checkpoint's starting snapshot "
                f"{sid} is no longer in the snapshot log (expired?) — "
                "restart from a fresh checkpoint"
            )
        names = [
            f.name
            for f in self.schema.fields
            if f.name not in ("_change_type", "_snapshot_id")
        ]
        res = _resolution(meta)
        resolve = None
        if res is not None:
            cur_by_name = {f["name"]: int(f["id"]) for f in res["ordered"]}
            ids = {}
            for n in names:
                fid = cur_by_name.get(n, res["name_to_id"].get(n))
                if fid is not None:
                    ids[int(fid)] = n
            resolve = {
                "ids": ids,
                "name_to_id": res["name_to_id"],
                "ambiguous": sorted(res["ambiguous"]),
            }

        props = meta.get("properties") or {}
        inject_consts = bool(
            props.get("converted-from-delta")
            or props.get("migrated-data-files")
        )
        if inject_consts and resolve is not None:
            # the one remaining unsupported corner, same policy as the
            # batch readers (_plan_scan and the format facade): the
            # renamed-column path reads by field id and cannot inject
            raise ValueError(
                "iceberg_stream readChangeFeed: renamed-column "
                "streaming on a converted/migrated partitioned table "
                "is not supported — read changes in batch "
                "(read_iceberg_changes)"
            )
        # converted/migrated provenance (r11, VERDICT r10 item #5 —
        # this replaces the r10 blanket refusal): the referenced files
        # LACK their identity partition columns, so every change kind
        # that assembles rows from a DATA file ships that file's typed
        # constants (spec §Column Projection) and merges them into the
        # row dicts before assembly and equality-key extraction.
        all_recs: dict[str, dict] = {}

        def state(i):
            if i < 0:
                return [], [], []
            return _manifest_entries(self.path, meta, snaps[i])

        cur_fields = {
            int(f["id"]): f["name"]
            for f in _current_schema(meta)["fields"]
        }

        def eq_desc(recs) -> tuple:
            """(path, seq, (key names…)) descriptors, equality_ids
            resolved through the CURRENT schema (field ids are the
            spec's stable identity; a dropped key column refuses)."""
            descs = []
            for r in recs:
                knames = []
                for fid in r["equality_ids"]:
                    n = cur_fields.get(int(fid))
                    if n is None:
                        raise ValueError(
                            "iceberg_stream: equality delete "
                            f"{r['path']} keys on field id {fid}, which "
                            "is not in the current schema — read this "
                            "range in batch (read_iceberg_changes)"
                        )
                    knames.append(n)
                descs.append(
                    (
                        urllib.parse.unquote(r["path"]),
                        int(r["seq"]),
                        tuple(knames),
                    )
                )
            return tuple(descs)

        out: list[_IceChangePartition] = []
        p_data, p_del, p_eq = state(lo - 1)
        if inject_consts:
            for r in p_data:
                all_recs.setdefault(r["path"], r)
        for i in range(lo, hi):
            c_data, c_del, c_eq = state(i)
            if inject_consts:
                for r in c_data:
                    all_recs.setdefault(r["path"], r)
            ssid = int(snaps[i]["snapshot-id"])
            prev_paths = {r["path"] for r in p_data}
            cur_paths = {r["path"] for r in c_data}
            prev_dpaths = {r["path"] for r in p_del}
            new_dels = sorted(
                r["path"] for r in c_del if r["path"] not in prev_dpaths
            )
            prev_epaths = {r["path"] for r in p_eq}
            new_eqs = [r for r in c_eq if r["path"] not in prev_epaths]
            removed = sorted(prev_paths - cur_paths)
            # Equality deletes stream per-task (r9, VERDICT r8 item
            # #2) with files consulted ONE AT A TIME (r10) and, since
            # r11, in BOUNDED BATCHES within each file (eq_kill_flags'
            # iter_batches chunking) — per-task key residency is one
            # maxEqDeleteRows-sized chunk, so NO key-file shape
            # refuses anymore: not a long backlog of small files, not
            # a single oversized file.
            prev_eq_d = eq_desc(p_eq)
            seq_of = {r["path"]: int(r["seq"]) for r in p_data}
            for p in sorted(cur_paths - prev_paths):
                # a file ADDED here outranks every delete in flight:
                # its data sequence equals the snapshot's, and both
                # prior and same-snapshot deletes gate on strictly-
                # smaller sequences — no eq subtraction needed
                out.append(
                    _IceChangePartition(
                        "ins", urllib.parse.unquote(p), new_dels,
                        frozenset(), ssid, names, resolve,
                    )
                )
            for p in removed:
                out.append(
                    _IceChangePartition(
                        "del", urllib.parse.unquote(p),
                        sorted(prev_dpaths), frozenset(), ssid, names,
                        resolve, eq_excl=prev_eq_d,
                        file_seq=seq_of.get(p, 0),
                    )
                )
            carried = {
                urllib.parse.unquote(p): seq_of.get(p, 0)
                for p in (prev_paths & cur_paths)
            }
            # posdel tasks exclude rows ANY equality delete kills —
            # prior files (already dead) and same-snapshot ones (the
            # eqdel task emits that overlap exactly once)
            all_eq_d = eq_desc(c_eq)
            for p in new_dels:
                out.append(
                    _IceChangePartition(
                        "posdel", urllib.parse.unquote(p),
                        sorted(prev_dpaths), carried, ssid, names,
                        resolve, eq_excl=all_eq_d,
                    )
                )
            if new_eqs:
                new_eq_d = eq_desc(new_eqs)
                max_eq_seq = max(s for _p, s, _k in new_eq_d)
                for p in sorted(prev_paths & cur_paths):
                    fseq = seq_of.get(p, 0)
                    if fseq >= max_eq_seq:
                        continue  # sequence gate: nothing can kill it
                    out.append(
                        _IceChangePartition(
                            "eqdel", urllib.parse.unquote(p),
                            sorted(prev_dpaths), frozenset(), ssid,
                            names, resolve, eq_files=new_eq_d,
                            eq_excl=prev_eq_d, file_seq=fseq,
                        )
                    )
            p_data, p_del, p_eq = c_data, c_del, c_eq
        if inject_consts and all_recs:
            from ..sources.iceberg import (
                _current_schema as _cur,
                _identity_const_plan as _icp,
            )

            plan = _icp(
                meta, _cur(meta), list(all_recs.values()), typed=True
            )
            if plan is not None:
                cmap = plan[1]
                for part in out:
                    if part.kind in ("ins", "del", "eqdel"):
                        part.consts = cmap.get(
                            os.path.basename(part.file_path)
                        )
                    else:  # posdel reads the carried data files
                        part.consts_map = {
                            os.path.basename(p): cmap.get(
                                os.path.basename(p)
                            )
                            for p in part.carried
                        }
        return out

    def read(self, partition: _IceChangePartition):
        import pyarrow.parquet as pq

        def aux_positions(paths) -> dict[str, set[int]]:
            """Read each prior position-delete file ONCE and bucket its
            rows by target-file basename — the per-data-file lookup
            below is then a dict get.  (ADVICE r8: the previous shape
            re-read every delete file per touched data file, so a
            compaction-starved table paid O(delete-files × touched-
            files) parquet reads per micro-batch.)"""
            m: dict[str, set[int]] = {}
            for dp in paths:
                t = pq.read_table(
                    urllib.parse.unquote(dp),
                    columns=["file_path", "pos"],
                )
                for fp, pos in zip(
                    t.column("file_path").to_pylist(),
                    t.column("pos").to_pylist(),
                ):
                    m.setdefault(
                        urllib.parse.unquote(os.path.basename(fp)), set()
                    ).add(int(pos))
            return m

        # maxEqDeleteRows (default 64k) is the key-set CHUNK size now,
        # not a refusal threshold (r11 — the r10 largest-single-file
        # gate is gone): key files stream through pyarrow iter_batches
        # in chunks of at most this many rows, so per-task residency
        # is one chunk + one flag byte per scanned row no matter how
        # large a single delete file grows
        eq_chunk = max(
            1, int(self.options.get("maxeqdeleterows", 1 << 16))
        )

        def eq_kill_flags(entries, descs) -> bytearray:
            """Per-row kill flags from equality-delete descriptors,
            processed ONE DELETE FILE AT A TIME and, within a file,
            ONE BOUNDED BATCH AT A TIME (r11, the last refusal of the
            r9/r10 residency series): peak key residency is
            ``eq_chunk`` rows — an arbitrarily large single key file
            (the case that still refused in r10) now streams.
            ``entries``: [(row dict, colmap, data-file sequence)].  A
            row is killed when ANY delete file with sequence STRICTLY
            above its data file's carries a matching key (spec gate);
            NULL keys match null-safely (tuple equality).  Delete
            files sharing a key-column set reuse one row-key
            extraction pass."""
            flags = bytearray(len(entries))
            groups: dict[tuple, list[tuple[str, int]]] = {}
            for pth, seq, knames in descs:
                groups.setdefault(tuple(knames), []).append((pth, int(seq)))
            for knames, files in sorted(groups.items()):
                row_keys = [
                    (tuple(r.get(cm.get(n)) for n in knames), fseq)
                    for r, cm, fseq in entries
                ]

                def mark(keys, seq):
                    for i, (rk, fseq) in enumerate(row_keys):
                        if not flags[i] and seq > fseq and rk in keys:
                            flags[i] = 1

                for pth, seq in sorted(files):
                    pf = pq.ParquetFile(pth)
                    cm = _colmap(pf.schema_arrow, partition.resolve)
                    file_cols = [cm[n] for n in knames if n in cm]
                    if not file_cols:
                        # no key column present in the file: every row
                        # carries the all-NULL key
                        if pf.metadata.num_rows:
                            mark({(None,) * len(knames)}, seq)
                        continue
                    for batch in pf.iter_batches(
                        batch_size=eq_chunk, columns=file_cols
                    ):
                        cols = [
                            batch.column(
                                file_cols.index(cm[n])
                            ).to_pylist()
                            if n in cm
                            else [None] * batch.num_rows
                            for n in knames
                        ]
                        keys = set(zip(*cols))
                        mark(keys, seq)
                        del keys
            return flags

        def merge_consts(rows: list[dict], colmap: dict, consts) -> dict:
            """Inject a converted/migrated file's identity-partition
            constants into its row dicts (and the colmap, so both row
            assembly and equality-key extraction see them)."""
            if not consts:
                return colmap
            for row in rows:
                row.update(consts)
            return {**colmap, **{n: n for n in consts}}

        if partition.kind in ("ins", "del"):
            table = pq.read_table(partition.file_path)
            colmap = _colmap(table, partition.resolve)
            dead = aux_positions(partition.aux_paths).get(
                urllib.parse.unquote(os.path.basename(partition.file_path)),
                set(),
            )
            live = [
                row
                for pos, row in enumerate(table.to_pylist())
                if pos not in dead
            ]
            colmap = merge_consts(live, colmap, partition.consts)
            excl_flags = eq_kill_flags(
                [(r, colmap, partition.file_seq) for r in live],
                partition.eq_excl,
            )
            ctype = "insert" if partition.kind == "ins" else "delete"
            for i, row in enumerate(live):
                if excl_flags[i]:
                    continue  # already eq-killed before this snapshot
                yield tuple(
                    [
                        row.get(colmap[n]) if n in colmap else None
                        for n in partition.names
                    ]
                    + [ctype, partition.snapshot_id]
                )
            return
        if partition.kind == "eqdel":
            # one carried data file vs the snapshot's NEW kill keys:
            # emit matches that were not already position- or eq-dead
            dead = aux_positions(partition.aux_paths).get(
                urllib.parse.unquote(os.path.basename(partition.file_path)),
                set(),
            )
            table = pq.read_table(partition.file_path)
            colmap = _colmap(table, partition.resolve)
            live = [
                row
                for pos, row in enumerate(table.to_pylist())
                if pos not in dead
            ]
            colmap = merge_consts(live, colmap, partition.consts)
            entries = [(r, colmap, partition.file_seq) for r in live]
            excl_flags = eq_kill_flags(entries, partition.eq_excl)
            match_flags = eq_kill_flags(entries, partition.eq_files)
            for i, row in enumerate(live):
                if not excl_flags[i] and match_flags[i]:
                    yield tuple(
                        [
                            row.get(colmap[n]) if n in colmap else None
                            for n in partition.names
                        ]
                        + ["delete", partition.snapshot_id]
                    )
            return
        # posdel: the delete file names (file_path, pos) rows; emit the
        # NEWLY-dead rows of files active across the transition
        t = pq.read_table(
            partition.file_path, columns=["file_path", "pos"]
        )
        by_file: dict[str, set[int]] = {}
        for fp, pos in zip(
            t.column("file_path").to_pylist(),
            t.column("pos").to_pylist(),
        ):
            by_file.setdefault(urllib.parse.unquote(fp), set()).add(int(pos))
        carried_base = {
            os.path.basename(p): p for p in partition.carried
        }
        aux = aux_positions(partition.aux_paths)  # one read per delete file
        # carried is a path → data-sequence map (the eq gate needs the
        # file's own sequence); iterating it yields the paths
        carried_seq = (
            dict(partition.carried)
            if isinstance(partition.carried, dict)
            else {p: 0 for p in partition.carried}
        )
        # gather the newly-dead rows of EVERY target file first, then
        # run ONE eq-exclusion pass over the combined batch — per-file
        # passes would re-read each delete file per target file (the
        # ADVICE-r8 quadratic shape)
        entries: list[tuple[dict, dict, int]] = []
        for fp, positions in sorted(by_file.items()):
            actual = carried_base.get(os.path.basename(fp))
            if actual is None:
                continue  # added or removed in this snapshot: handled
                # by the ins/del partitions (net effect), or foreign
            already = aux.get(
                urllib.parse.unquote(os.path.basename(actual)), set()
            )
            fresh = positions - already
            if not fresh:
                continue
            table = pq.read_table(actual)
            colmap = _colmap(table, partition.resolve)
            # materialize ONLY the dead positions (Table.take), never
            # the whole file — a point delete on a large file stays
            # O(deleted rows) here
            idx = sorted(p for p in fresh if p < table.num_rows)
            fseq = int(carried_seq.get(actual, 0))
            rows = table.take(idx).to_pylist()
            colmap = merge_consts(
                rows,
                colmap,
                (partition.consts_map or {}).get(os.path.basename(actual)),
            )
            for row in rows:
                entries.append((row, colmap, fseq))
        excl_flags = eq_kill_flags(entries, partition.eq_excl)
        for i, (row, colmap, _fseq) in enumerate(entries):
            if excl_flags[i]:
                continue  # eq-killed earlier (or by this snapshot's
                # eqdel task — which emits it instead)
            yield tuple(
                [
                    row.get(colmap[n]) if n in colmap else None
                    for n in partition.names
                ]
                + ["delete", partition.snapshot_id]
            )

    def commit(self, end: dict) -> None:
        pass


class IcebergStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "iceberg_stream"

    def _cdf(self) -> bool:
        return (
            str(self.options.get("readchangefeed", "false")).lower()
            == "true"
        )

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("iceberg_stream requires .load(<table path>)")
        st = _schema_to_spark(_current_schema(_load_metadata(path)))
        if self._cdf():
            st = st.add("_change_type", "string").add("_snapshot_id", "long")
        return st

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        if self._cdf():
            return IcebergChangesStreamReader(schema, self.options)
        return IcebergStreamReader(schema, self.options)


def register(spark: SparkSession) -> None:
    try:
        spark.dataSource.register(IcebergStreamSource)
    except Exception:  # noqa: BLE001 — already registered in this session
        pass



# ------------------------------------------------------------------ query


def stream_from_iceberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream FROM an Iceberg table: two append snapshots over an
    orders slice, tailed by the ``iceberg_stream`` source
    (availableNow) into a parquet sink, then aggregated.  The oracle
    recomputes the union of both appends from the fixture — a dropped
    file, a double-read snapshot, or a broken offset diff all fail
    the hash compare.  (The Iceberg twin of ``b_stream_delta_source``;
    r6.)"""
    import atexit as _atexit
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from pyspark.sql import functions as F

    from ..functions.numeric import money_sum
    from ..sources.iceberg import write_iceberg
    from ..sources.readers import load_table

    register(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    tmp = _tempfile.mkdtemp(prefix="spark_graft_istream_")
    _atexit.register(_shutil.rmtree, tmp, ignore_errors=True)
    t = _os.path.join(tmp, "t")
    write_iceberg(
        orders.filter(F.col("o_orderkey") % 11 == 0).coalesce(1),
        t, mode="error", partition_by=["o_orderpriority"],
    )
    write_iceberg(
        orders.filter(F.col("o_orderkey") % 11 == 1).coalesce(1),
        t, mode="append", partition_by=["o_orderpriority"],
    )
    from .drive import run_stream_to_completion

    out = _os.path.join(tmp, "out")
    run_stream_to_completion(
        lambda: (
            spark.readStream.format("iceberg_stream").load(t)
            .writeStream.trigger(availableNow=True)
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", _os.path.join(tmp, "ckpt"))
            .start()
        )
    )
    back = spark.read.parquet(out)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        money_sum("o_totalprice").alias("total_price"),
    )


def stream_iceberg_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream of an Iceberg table's row-level CHANGELOG: a
    position-delete snapshot, a MERGE-ON-READ MERGE (update =
    position delete + postimage insert), then an EQUALITY-delete
    commit (``delete_by_key_iceberg`` — the Flink-CDC shape, r9)
    stream as insert/delete rows via ``readChangeFeed=true`` —
    snapshots the append-only tail must refuse.  The oracle
    recomputes every change class arithmetically; a resurrected dead
    row, a double-emitted position, a lost postimage, or an eq kill
    that ignored the sequence gate (killing the original instead of
    the re-inserted version) all fail the hash compare."""
    import atexit as _atexit
    import shutil as _shutil
    import tempfile as _tempfile

    from pyspark.sql import functions as F

    from ..functions.numeric import money_sum
    from ..sources.iceberg import (
        delete_by_key_iceberg,
        delete_iceberg_rows,
        merge_iceberg,
        write_iceberg,
    )
    from ..sources.readers import load_table

    register(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    tmp = _tempfile.mkdtemp(prefix="spark_graft_icdf_")
    _atexit.register(_shutil.rmtree, tmp, ignore_errors=True)
    t = os.path.join(tmp, "t")
    write_iceberg(
        orders.filter(F.col("o_orderkey") % 3 == 0).coalesce(2),
        t, mode="error",
    )                                                     # snapshot 1
    delete_iceberg_rows(spark, t, F.col("o_orderkey") % 30 == 0)  # 2
    source = orders.filter(F.col("o_orderkey") % 6 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(1000.0)
    ).unionByName(orders.filter(F.col("o_orderkey") % 3 == 1))
    merge_iceberg(
        spark, t, source, on=["o_orderkey"],
        clauses=[
            {"when": "matched", "action": "update",
             "condition": "t.o_orderkey % 12 = 0"},
            {"when": "matched", "action": "delete"},
            {"when": "not_matched", "action": "insert"},
        ],
        strategy="mor",
    )                                                     # snapshot 3
    delete_by_key_iceberg(                                # snapshot 4:
        spark, t,                                         # equality delete
        orders.filter(F.col("o_orderkey") % 15 == 0)
        .select("o_orderkey").distinct(),
    )
    from .drive import run_stream_to_completion

    out = os.path.join(tmp, "out")
    run_stream_to_completion(
        lambda: (
            spark.readStream.format("iceberg_stream")
            .option("readChangeFeed", "true")
            .option("startingPos", 1)
            .load(t)
            .writeStream.trigger(availableNow=True)
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .start()
        )
    )
    back = spark.read.parquet(out)
    return back.groupBy("_change_type").agg(
        F.count("*").alias("n"),
        money_sum("o_totalprice").alias("total_price"),
    )


def _register_query() -> None:
    from ..functions.numeric import sql_money_sum
    from ..registry import query

    query(
        "b_stream_iceberg_source",
        f"""
        SELECT o_orderpriority, count(*) AS n,
               {sql_money_sum("o_totalprice")} AS total_price
        FROM orders
        WHERE o_orderkey % 11 = 0 OR o_orderkey % 11 = 1
        GROUP BY o_orderpriority
        """,
    )(stream_from_iceberg)

    # Changelog classes: the position-delete snapshot kills ≡0 (mod
    # 30); the MOR merge position-deletes every LIVE matched key (≡0
    # mod 6 — update and delete clauses both kill the old version),
    # re-inserts postimages for live ≡0 (mod 12), and inserts the
    # unmatched source keys — ≡1 (mod 3) at original price plus the
    # DEAD ≡0 (mod 30) keys at source (+1000) price.  The equality
    # delete (keys ≡0 mod 15, r9) then kills the surviving ODD
    # 15-multiples (never merge-matched: 15·odd is not ≡0 mod 6) at
    # original price AND the re-inserted ≡0 (mod 30) rows at +1000 —
    # the re-insert's data sequence postdates snapshot 2's kill, so
    # only the LATEST version dies (the spec's sequence gate).
    query(
        "b_stream_iceberg_cdf",
        f"""
        WITH b AS (
          SELECT o_orderkey AS k, o_totalprice AS p FROM orders
          WHERE o_orderkey % 3 = 0
        ),
        live AS (SELECT * FROM b WHERE k % 30 <> 0),
        changes AS (
          SELECT 'delete' AS ct, p FROM b WHERE k % 30 = 0
          UNION ALL
          SELECT 'delete' AS ct, p FROM live WHERE k % 6 = 0
          UNION ALL
          SELECT 'insert' AS ct, p + 1000 AS p FROM live WHERE k % 12 = 0
          UNION ALL
          SELECT 'insert' AS ct, o_totalprice AS p FROM orders
          WHERE o_orderkey % 3 = 1
          UNION ALL
          SELECT 'insert' AS ct, p + 1000 AS p FROM b WHERE k % 30 = 0
          UNION ALL
          SELECT 'delete' AS ct, p FROM live WHERE k % 15 = 0
          UNION ALL
          SELECT 'delete' AS ct, p + 1000 AS p FROM b WHERE k % 30 = 0
        )
        SELECT ct AS _change_type, count(*) AS n,
               {sql_money_sum('p')} AS total_price
        FROM changes
        GROUP BY ct
        """,
    )(stream_iceberg_cdf)


_register_query()
