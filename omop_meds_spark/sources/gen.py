"""Deterministic synthetic WAL generator.

Emits a change-event log (insert/update/delete) over a source table of code
repositories ``(repo, path, commit, lang, content)`` per BASELINE.json's
input_hint. Written directly with numpy + pyarrow (seeded, no Spark) so the
byte content is reproducible regardless of parallelism — the generated WAL is
the *input*; the engine under test is Spark.

Properties baked in (so every hard part of the engine is exercised):

* **hot-key skew** — repo_0 receives ~30% of all events (tests salting /
  AQE skew handling, per SURVEY.md §4 and the north rule).
* **duplicate deliveries** — ~1% of events are re-emitted with the same
  event_id (tests exactly-once dedup on (event_id, key)).
* **schema evolution** — events after 60% of the stream carry a new
  ``size_bytes`` column; events after 80% rename ``lang`` → ``language``
  (the added/renamed-column analogue of the reference's permissive shard
  alignment, reference: src/OMOP_MEDS/pre_meds_data_loader.py:341-507).
* **out-of-order arrival within a file** — rows inside each WAL file are
  shuffled (seq_no is the total order, file order is not).

The WAL directory layout is ``wal/{file_idx:06d}.parquet``; lexicographic
file order is the replay order between files (reference sorts shard lists
for determinism, pre_meds_data_loader.py:89,270).
"""

from __future__ import annotations

import concurrent.futures
import hashlib
import json
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["py", "rs", "go", "js", "java", "c", "md"]
LANG_OF_EXT = {e: e for e in LANGS}

# evolution breakpoints, as fractions of the stream
ADD_COL_AT = 0.6  # size_bytes appears
RENAME_AT = 0.8  # lang -> language


def _content(repo_i: np.ndarray, path_i: np.ndarray, seq: np.ndarray) -> list[str]:
    # Deterministic pseudo-source-code; varies per (repo, path, seq) so every
    # update genuinely changes content (and therefore its sha256).
    return [
        f"// repo_{r}/f{p}.src rev {s}\nfn main_{p}() {{ let x = {(r * 31 + p * 7 + s) % 9973}; }}\n"
        * (1 + (s % 3))
        for r, p, s in zip(repo_i.tolist(), path_i.tolist(), seq.tolist())
    ]


def _write_wal_file(task: tuple) -> dict:
    """Materialize one WAL file from its (repo_i, path_i, seq, op) row slice.

    The per-row payload columns (content, commit sha, event_id, size) are
    pure functions of those inputs, so each file can be built independently
    — in a worker process for big WALs — with byte-identical output to the
    old single-pass writer (same values, same column order, same parquet
    writer settings)."""
    fp, repo_i, path_i, seq, op, add_at, ren_at, row_group_size = task
    repo = np.char.add("repo_", repo_i.astype(str))
    path = np.char.add(np.char.add("src/f", path_i.astype(str)), ".src")
    lang = np.array(LANGS, dtype=object)[(repo_i * 13 + path_i) % len(LANGS)]
    content = _content(repo_i, path_i, seq)
    commit = [hashlib.sha1(f"{r}|{p}|{s}".encode()).hexdigest()[:12]
              for r, p, s in zip(repo.tolist(), path.tolist(), seq.tolist())]
    event_id = np.char.add("e", np.char.zfill(seq.astype(str), 12))
    max_seq = int(seq.max())
    data = {
        "seq_no": seq,
        "event_id": event_id.astype(object),
        "op": op,
        "repo": repo.astype(object),
        "path": path.astype(object),
        "commit": np.array(commit, dtype=object),
        "lang": lang,
        "content": np.array(content, dtype=object),
    }
    if max_seq >= add_at:
        data["size_bytes"] = np.array([len(c) for c in content], dtype=np.int64)
    if max_seq >= ren_at:
        data["language"] = data.pop("lang")  # renamed column from here on
    table = pa.table(data)
    # small row groups keep scan parallelism ≥ cores even when a batch
    # spans few files (row group = Spark's split granularity for parquet)
    pq.write_table(table, fp, row_group_size=row_group_size)
    return {"file": Path(fp).name, "rows": len(seq), "max_seq": max_seq}


def generate_wal(
    out_dir: str | Path,
    n_events: int = 100_000,
    n_repos: int = 50,
    paths_per_repo: int = 200,
    n_files: int = 20,
    seed: int = 42,
    hot_frac: float = 0.30,
    dup_frac: float = 0.01,
    delete_frac: float = 0.08,
    row_group_size: int = 16_000,
    workers: int | None = None,
) -> dict:
    """Write a deterministic WAL to ``out_dir``; returns a manifest dict.

    ``workers``: processes for per-file payload generation (the only
    per-row Python in the generator). Default: serial below 1M events,
    else ``min(16, cpus)``. Output bytes are identical at any worker
    count — all randomness is drawn in the parent before the fan-out.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)

    seq = np.arange(n_events, dtype=np.int64)

    # hot-key skew: repo 0 gets hot_frac of events, rest uniform over 1..n_repos-1
    hot = rng.random(n_events) < hot_frac
    repo_i = np.where(hot, 0, rng.integers(1, n_repos, n_events))
    path_i = rng.integers(0, paths_per_repo, n_events)

    op = np.where(rng.random(n_events) < delete_frac, "D", "U")
    # first event for a key is logically an insert; mark a plain 'I' for ~the
    # earliest ops (engine treats I and U identically: upsert)
    op[seq < n_events // 10] = np.where(op[seq < n_events // 10] == "D", "D", "I")
    op_obj = op.astype(object)

    # duplicate deliveries: re-emit ~dup_frac of events (same event_id/seq).
    # A dup lands in the next WAL file; restrict candidates so original and
    # redelivery fall in the same schema era (otherwise the two copies would
    # carry different payloads — null vs populated size_bytes — and dedup
    # would be non-deterministic).
    def _era(file_idx: np.ndarray) -> np.ndarray:
        # file f holds seq range [f*n/nf, (f+1)*n/nf); era = schema version
        top_seq = ((file_idx + 1) * n_events) // n_files - 1
        return np.where(top_seq >= int(n_events * RENAME_AT), 2,
                        np.where(top_seq >= int(n_events * ADD_COL_AT), 1, 0))

    n_dups = int(n_events * dup_frac)
    all_files = np.minimum((seq * n_files) // n_events, n_files - 1)
    same_era = _era(all_files) == _era(np.minimum(all_files + 1, n_files - 1))
    candidates = seq[same_era]
    dup_idx = rng.choice(candidates, size=min(n_dups, len(candidates)), replace=False)
    order = np.concatenate([np.arange(n_events), dup_idx])
    # shuffle within files but keep files ~= contiguous seq ranges:
    # sort by (file assignment, random) below.
    file_of = np.minimum((order * n_files) // n_events, n_files - 1)
    # dup rows land in a *later* file than the original (redelivery)
    file_of[n_events:] = np.minimum(file_of[n_events:] + 1, n_files - 1)
    jitter = rng.random(len(order))
    emit_order = np.lexsort((jitter, file_of))

    add_at = int(n_events * ADD_COL_AT)
    ren_at = int(n_events * RENAME_AT)
    # emit_order is lexsorted with file_of as the primary key, so each
    # file's rows are one contiguous run — slice by searchsorted bounds
    fo_sorted = file_of[emit_order]
    bounds = np.searchsorted(fo_sorted, np.arange(n_files + 1))
    tasks = []
    for f_idx in range(n_files):
        rows = order[emit_order[bounds[f_idx]:bounds[f_idx + 1]]]
        if len(rows) == 0:
            continue
        tasks.append((str(out / f"{f_idx:06d}.parquet"),
                      repo_i[rows], path_i[rows], seq[rows], op_obj[rows],
                      add_at, ren_at, row_group_size))
    if workers is None:
        workers = 1 if n_events < 1_000_000 else min(16, os.cpu_count() or 1)
    if workers <= 1 or len(tasks) <= 1:
        files = [_write_wal_file(t) for t in tasks]
    else:
        with concurrent.futures.ProcessPoolExecutor(
                max_workers=min(workers, len(tasks))) as ex:
            files = list(ex.map(_write_wal_file, tasks))

    manifest = {
        "n_events": n_events,
        "n_repos": n_repos,
        "paths_per_repo": paths_per_repo,
        "n_files": len(files),
        "seed": seed,
        "files": files,
        "evolution": {"size_bytes_at": add_at, "rename_lang_at": ren_at},
    }
    (out / "_wal_manifest.json").write_text(json.dumps(manifest, indent=1))
    return manifest


def replay_oracle(wal_dir: str | Path) -> "pa.Table":
    """Brute-force single-threaded replay oracle (pandas), for verification.

    Applies the WAL in strict seq_no order: dedup on event_id, last-writer-
    wins per (repo, path), deletes remove the key. Returns the live final
    state sorted by (repo, path) with content_sha256.
    """
    import pandas as pd

    parts = []
    for fp in sorted(Path(wal_dir).glob("*.parquet")):
        pdf = pq.read_table(fp).to_pandas()
        if "language" in pdf.columns:
            pdf = pdf.rename(columns={"language": "lang"})
        parts.append(pdf)
    df = pd.concat(parts, ignore_index=True)
    if "size_bytes" not in df.columns:
        df["size_bytes"] = pd.array([None] * len(df), dtype="Int64")
    df = df.drop_duplicates(subset=["event_id"], keep="first")
    df = df.sort_values("seq_no").drop_duplicates(subset=["repo", "path"], keep="last")
    df = df[df["op"] != "D"]
    df["content_sha256"] = [
        hashlib.sha256(c.encode()).hexdigest() if isinstance(c, str) else None
        for c in df["content"]
    ]
    for name, series in _normalize_oracle(df["content"], df["lang"]).items():
        df[name] = series
    return df.sort_values(["repo", "path"]).reset_index(drop=True)


# pandas twins of runner.normalize_events — the convert-stage columns the
# engine persists into state, reproduced independently for verification.
_TOKEN_RX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"
_LANG_STOP = {
    "en": r"\b(?:the|and|of|to|is|that|with)\b",
    "de": r"\b(?:der|die|das|und|ist|nicht|mit)\b",
    "fr": r"\b(?:le|la|les|et|est|dans|pour)\b",
    "es": r"\b(?:el|los|las|es|en|para|una)\b",
}
_LANG_PRIORITY = ["en", "de", "fr", "es"]
_LANG_CODE_MAP = {
    "py": "LANG//python", "rs": "LANG//rust", "go": "LANG//go",
    "js": "LANG//javascript", "java": "LANG//java", "c": "LANG//c",
    "md": "LANG//markdown",
}


def _normalize_oracle(content, lang) -> dict:
    import re

    import pandas as pd

    def lang_pred(t: str) -> str:
        low = t.lower()
        scores = {k: len(re.findall(rx, low)) for k, rx in _LANG_STOP.items()}
        best = max(scores.values())
        if best <= 0:
            return "und"
        for k in _LANG_PRIORITY:
            if scores[k] == best:
                return k
        return "und"

    texts = ["" if not isinstance(t, str) else t for t in content]
    return {
        "token_count": pd.Series([len(re.findall(_TOKEN_RX, t)) for t in texts],
                                 index=content.index, dtype="int64"),
        "lang_pred": pd.Series([lang_pred(t) for t in texts], index=content.index),
        "n_lines": pd.Series([len(t.split("\n")) for t in texts],
                             index=content.index, dtype="int64"),
        "max_line_len": pd.Series(
            [max((len(x) for x in t.split("\n")), default=0) for t in texts],
            index=content.index, dtype="int64"),
        "lang_code": pd.Series(
            [_LANG_CODE_MAP.get(v, "LANG//" + (v if isinstance(v, str) else "unknown"))
             for v in lang], index=content.index),
    }


def meds_replay_oracle(wal_dir: str | Path) -> "pa.Table":
    """Oracle for the MEDS-shaped target: the live replay state projected
    exactly like operators/meds.py:change_winners_to_meds. String-rendered
    time/numeric so fingerprints match Spark's canonical string casts."""
    import pandas as pd

    live = replay_oracle(wal_dir)
    out = pd.DataFrame(
        {
            "subject_id": [
                int(hashlib.md5(r.encode()).hexdigest()[:15], 16) for r in live["repo"]
            ],
            "time": [str(pd.Timestamp(int(s), unit="s")) for s in live["seq_no"]],
            "code": "FILE//" + live["path"],
            "numeric_value": [
                None if pd.isna(v) else f"{float(v):.1f}" for v in live["size_bytes"]
            ],
            "text_value": live["content_sha256"],
            "seq_no": live["seq_no"],
        }
    )
    return out.sort_values(["subject_id", "code"]).reset_index(drop=True)
