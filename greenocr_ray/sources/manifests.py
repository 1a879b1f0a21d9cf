"""Label-manifest sources (SURVEY.md §2.1 S3/S4/S5) and the key=value
config reader (S6) — Ray-Data-native re-expressions of the reference's
hand-rolled parsers. Same skip-and-log semantics: malformed lines are
collected into a rejects list instead of failing the read
(`exe_t.py:319-336` prints and continues).

All three manifest readers return ``ray.data.Dataset`` with schema
(key: string, text: string) so they compose with the fixture joins
(G5 broadcast pattern).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import ray.data as rd


def _from_rows(keys: list[str], texts: list[str]) -> rd.Dataset:
    return rd.from_arrow(
        pa.table(
            {
                "key": pa.array(keys, type=pa.string()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )


def parse_pipe_lines(lines: list[str]) -> tuple[list[tuple[str, str]], list[str]]:
    """``name|text`` format (`exe_t.py:329-336`, writer side
    `ENHANCMENT24.py:123-124`). Returns (samples, rejected_lines)."""
    samples: list[tuple[str, str]] = []
    rejects: list[str] = []
    for line in lines:
        try:
            name, text = line.strip().split("|", 1)
            samples.append((name, text))
        except ValueError:
            rejects.append(line)
    return samples, rejects


def parse_iam64_lines(lines: list[str]) -> tuple[list[tuple[str, str]], list[str]]:
    """``folder,name<SPACE>text`` format; key = ``folder/name.png``
    (`exe_t.py:319-328`, `train.py:889-896`)."""
    samples: list[tuple[str, str]] = []
    rejects: list[str] = []
    for line in lines:
        try:
            folder_image, text = line.strip().split(" ", 1)
            folder, image_name = folder_image.strip().split(",")
            samples.append((f"{folder}/{image_name}.png", text))
        except ValueError:
            rejects.append(line)
    return samples, rejects


def _log_rejects(path: str, rejects: list[str]) -> None:
    if rejects:
        # the reference prints each bad line and continues
        # (exe_t.py:319-336); keep that observable skip-and-LOG contract
        print(
            f"[manifests] {path}: skipped {len(rejects)} malformed "
            f"line(s), e.g. {rejects[0]!r}",
            file=sys.stderr,
        )


def read_pipe_manifest(path: str) -> rd.Dataset:
    with open(path, encoding="utf-8") as fh:
        samples, rejects = parse_pipe_lines(fh.readlines())
    _log_rejects(path, rejects)
    return _from_rows([s[0] for s in samples], [s[1] for s in samples])


def read_iam64_manifest(path: str) -> rd.Dataset:
    with open(path, encoding="utf-8") as fh:
        samples, rejects = parse_iam64_lines(fh.readlines())
    _log_rejects(path, rejects)
    return _from_rows([s[0] for s in samples], [s[1] for s in samples])


def read_sidecar_labels(transcriptions_dir: str) -> rd.Dataset:
    """ICDAR-style per-image ``.txt`` sidecars: key = stem, text =
    file content (`preprocessIcdData.py:102`)."""
    keys, texts = [], []
    for f in sorted(os.listdir(transcriptions_dir)):
        if not f.endswith(".txt"):
            continue
        with open(os.path.join(transcriptions_dir, f), encoding="utf-8") as fh:
            keys.append(f[: -len(".txt")])
            texts.append(fh.read().strip())
    return _from_rows(keys, texts)


def read_config(path: str) -> dict[str, str]:
    """``key=value`` config parse, one per line — the reference's whole
    config system (`exe_t.py:435-440`, `train.py:857-872`)."""
    out: dict[str, str] = {}
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            name, _, var = line.rstrip("\n").strip().partition("=")
            if name.strip():
                out[name.strip()] = var.strip()
    return out
