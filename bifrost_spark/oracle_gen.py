"""Independent (Spark-free) recompute of the synthetic CDC stream's final
table state — the driver-facing oracle for ``cdc_replay_e2e``.

``bifrost_spark.generator`` derives every event as a pure function of
(seed, index) using Spark's ``xxhash64`` expression.  This module
re-derives the SAME stream in vectorized numpy — including a bit-exact
reimplementation of Spark's XXH64 (the xxHash64 algorithm of Yann Collet,
public domain / BSD, as specialized by Spark for int/long inputs in
``org.apache.spark.sql.catalyst.expressions.XXH64``) — then applies the
events ONE AT A TIME to a plain Python dict (the sequential-apply
semantics the reference's single-threaded consume loop has,
/root/reference/server/to_server_consume.go:50-484).  The distributed
LWW+MERGE engine must agree with this byte-for-byte, which is exactly the
north rule's "final table state equals the reference after full replay"
check — computed with no Spark, no DataFrames, no shared code path beyond
GeneratorConfig itself.

Float caveat: two expressions use ``pow`` (the zipf repo map and the
phase-2 key skew).  numpy and the JVM both evaluate IEEE-754 doubles and
agree except possibly in the final ulp of ``pow``; a disagreement would
only matter if a value landed within 1 ulp of a floor() boundary, which
for the configs used is ruled out (verified empirically by
tests/test_oracle_gen.py comparing against the Spark generator column by
column).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from bifrost_spark.generator import _LANG_NAMES, _LANGS, GeneratorConfig

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_SPARK_XXHASH_SEED = np.uint64(42)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r_ = np.uint64(r)
    return (x << r_) | (x >> np.uint64(64 - r))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h


def _xxh64_long(v: np.ndarray, seed: np.ndarray) -> np.ndarray:
    """Spark XXH64.hashLong for uint64 arrays."""
    h = seed + _P5 + np.uint64(8)
    k = _rotl(v * _P2, 31) * _P1
    h = h ^ k
    h = _rotl(h, 27) * _P1 + _P4
    return _fmix(h)


def _xxh64_int(v: np.ndarray, seed: np.ndarray) -> np.ndarray:
    """Spark XXH64.hashInt: the int is zero-EXTENDED to 64 bits (as an
    unsigned 32-bit value) before the multiply."""
    h = seed + _P5 + np.uint64(4)
    h = h ^ ((v & np.uint64(0xFFFFFFFF)) * _P1)
    h = _rotl(h, 23) * _P2 + _P3
    return _fmix(h)


def xxhash64(*cols) -> np.ndarray:
    """Emulate ``F.xxhash64(c1, c2, ...)``: fold each input into the running
    hash (initial seed 42), dispatching on declared width.  Each col is a
    tuple ``(values, kind)`` with kind in {"long", "int"}; values may be a
    scalar or an ndarray."""
    arrays = [np.asarray(v, dtype=np.uint64) for v, _k in cols]
    n = max((a.size for a in arrays), default=1)
    h = np.full(max(n, 1), _SPARK_XXHASH_SEED, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for (v, kind), a in zip(cols, arrays):
            a = np.broadcast_to(a, h.shape) if a.ndim else np.full(h.shape, a)
            h = _xxh64_long(a, h) if kind == "long" else _xxh64_int(a, h)
    return h


def _pmod(h: np.ndarray, m: int) -> np.ndarray:
    """Spark pmod over the SIGNED 64-bit interpretation of the hash."""
    return (h.astype(np.int64) % np.int64(m)).astype(np.int64)


def _u(idx: np.ndarray, seed: int, tag: int) -> np.ndarray:
    """generator._u: uniform in [0,1) from pmod(xxhash64(idx, seed, tag), 1e6)."""
    return _pmod(xxhash64((idx, "long"), (seed, "int"), (tag, "int")), 1_000_000) / 1_000_000.0


def _repo_of(key: np.ndarray, cfg: GeneratorConfig) -> np.ndarray:
    frac = key.astype(np.float64) / float(max(cfg.n_keys, 1))
    idx = np.minimum(cfg.n_repos - 1,
                     np.floor(np.power(frac, cfg.zipf_exp) * float(cfg.n_repos)).astype(np.int64))
    names = np.array([f"repo_{i:05d}" for i in range(max(cfg.n_repos, 2))], dtype=object)
    names[0], names[1] = "linux", "chromium"
    return names[idx]


def _ext_idx(key: np.ndarray, cfg: GeneratorConfig) -> np.ndarray:
    return _pmod(xxhash64((key, "long"), (cfg.seed, "int"), (77, "int")), len(_LANGS))


def _path_of(key: np.ndarray, cfg: GeneratorConfig) -> np.ndarray:
    exts = np.array(_LANGS, dtype=object)[_ext_idx(key, cfg)]
    return np.array(
        [f"dir{int(k) % 97:02d}/file_{int(k):08d}.{e}" for k, e in zip(key, exts)],
        dtype=object,
    )


def _content_and_commit(key: int, event_id: int, seed: int) -> tuple[str, str]:
    h = hashlib.sha256(f"{seed}|{key}|{event_id}".encode()).hexdigest()
    nblocks = int(_pmod(xxhash64((np.uint64(key), "long"), (np.uint64(event_id), "long"),
                                 (seed + 5, "int")), 6)[0]) + 1
    content = f"// file {key} rev {event_id}\n" + "\n".join(
        f"{h}_{i}" for i in range(1, nblocks + 1)
    )
    return content, h[:40]


def expected_final_state(cfg: GeneratorConfig) -> pd.DataFrame:
    """Sequentially apply the recomputed stream; return the final live rows
    as (repo, path, commit, lang, content_sha, last_event_id), sorted by PK.
    Mirrors generator.generate_events + operators.lww.events_to_ops
    semantics: update = delete(before-PK) + upsert(after) when the PK
    changed; deletes drop the key; snapshot rows carry last_event_id=0."""
    n = cfg.n_events
    idx = np.arange(n, dtype=np.uint64)
    u_op = _u(idx, cfg.seed, 1)
    u_key = _u(idx, cfg.seed, 2)
    u_pk = _u(idx, cfg.seed, 3)

    phase1 = idx.astype(np.int64) < cfg.phase1
    p2_key = np.floor(np.power(u_key, cfg.key_skew_exp) * float(cfg.n_keys)).astype(np.int64)
    key = np.where(phase1, idx.astype(np.int64), p2_key)

    upd_hi = 1.0 - cfg.delete_ratio
    etype = np.where(
        phase1, "insert",
        np.where(u_op >= upd_hi, "delete", np.where(u_op < 0.5, "update", "insert")),
    )
    pk_change = (etype == "update") & (u_pk < cfg.pk_change_ratio)
    key2 = (key + 1 + _pmod(xxhash64((idx, "long"), (cfg.seed, "int"), (9, "int")), 997)) % cfg.n_keys
    event_id = idx.astype(np.int64) * 2 + 2
    after_key = np.where(pk_change, key2, key)

    langs = np.array([_LANG_NAMES[x] for x in _LANGS], dtype=object)

    # pre-vectorized per-key attributes for all touched keys
    all_keys = np.unique(np.concatenate([key, after_key, np.arange(cfg.snapshot_keys, dtype=np.int64)]))
    repo_map = dict(zip(all_keys.tolist(), _repo_of(all_keys, cfg).tolist()))
    path_map = dict(zip(all_keys.tolist(), _path_of(all_keys, cfg).tolist()))
    lang_map = dict(zip(all_keys.tolist(), langs[_ext_idx(all_keys, cfg)].tolist()))

    state: dict[tuple[str, str], tuple[int, int]] = {}  # (repo,path) -> (key, event_id)
    for k in range(cfg.snapshot_keys):
        state[(repo_map[k], path_map[k])] = (k, 0)

    for i in range(n):
        et = etype[i]
        k = int(key[i])
        pk = (repo_map[k], path_map[k])
        if et == "delete":
            state.pop(pk, None)
            continue
        if et == "update" and pk_change[i]:
            state.pop(pk, None)
            k2 = int(key2[i])
            state[(repo_map[k2], path_map[k2])] = (k2, int(event_id[i]))
        else:
            ak = int(after_key[i])
            state[(repo_map[ak], path_map[ak])] = (ak, int(event_id[i]))

    rows = []
    for (repo, path), (k, eid) in state.items():
        content, commit = _content_and_commit(k, eid, cfg.seed)
        rows.append(
            {
                "repo": repo,
                "path": path,
                "commit": commit,
                "lang": lang_map[k],
                "content_sha": hashlib.sha256(content.encode()).hexdigest(),
                "last_event_id": eid,
            }
        )
    df = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content_sha", "last_event_id"])
    return df.sort_values(["repo", "path"]).reset_index(drop=True)
