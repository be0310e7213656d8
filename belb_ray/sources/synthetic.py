"""Deterministic synthetic fixture generator (FIXTURES.md F1–F7).

Generates the ER graft's primary input table
``files(repo, path, commit, lang, content, content_sha256)`` plus gold
labels and the KB-analog side tables, all seeded — no external data.

Controlled lineage: every row descends from a template family; members are
exact duplicates (vendored-file analog — the hot-key/skew fixture), near
duplicates (k token substitutions), or singletons. Gold clusters = family
membership; gold pairs = within-family positives + same-block cross-family
negatives ("labeled pairs at matched blocking keys", BASELINE.json metric).

KB-analog tables replay the reference's relational schema
(belb/kbs/schema.py:139-293 — SURVEY §1.1): ``synonyms`` (kb),
``history`` (identifier redirects incl. 2-hop chains and the "-1"
obsolete sentinel, belb/preprocessing/data.py:24), ``id_mapping``
(string→dense int, belb/kbs/ctd_diseases/ctd_diseases.py:120-130).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.hashing import sha256_hex_list, stable_id64_list

LANGS = ["py", "js", "go", "java", "rs", "c", "rb", "ts"]
# one lang holds ~50% of rows (skew knob, FIXTURES.md)
LANG_WEIGHTS = np.array([0.50, 0.15, 0.10, 0.07, 0.06, 0.05, 0.04, 0.03])

_VOCAB = [
    f"{w}{i}" for i in range(40)
    for w in ("def", "fn", "var", "let", "return", "import", "class", "self",
              "value", "node", "index", "batch", "table", "hash", "merge")
]


def _hex40(rng_bytes: bytes) -> str:
    return hashlib.sha1(rng_bytes).hexdigest()


def make_fixture(
    n_files: int = 5000,
    seed: int = 42,
    avg_family: int = 4,
    near_edit_frac: float = 0.02,
    vendored_frac: float = 0.05,
    max_gold_pairs_per_family: int = 50,
) -> dict[str, pa.Table]:
    """Build all fixture tables. Deterministic in (n_files, seed)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_VOCAB)

    n_vendored = max(3, int(n_files * vendored_frac))
    n_singletons = max(2, n_files // 5)
    n_family_rows = n_files - n_vendored - n_singletons
    n_families = max(1, n_family_rows // avg_family)

    rows_repo, rows_path, rows_lang, rows_content = [], [], [], []
    rows_family = []  # lineage: family id per row (singletons get unique ids)

    def family_members(fam: int, size: int, lang: str, template: np.ndarray):
        """Emit one family: member 0 original, ~half exact dups, rest near dups."""
        base_name = f"mod_{fam}"
        n_exact = max(0, (size - 1) // 2)
        for m in range(size):
            if m == 0 or m <= n_exact:
                toks = template
                suffix = "" if m == 0 else f"_copy{m}"
            else:
                toks = template.copy()
                n_edit = max(1, int(len(toks) * near_edit_frac))
                pos = rng.choice(len(toks), size=n_edit, replace=False)
                toks[pos] = rng.integers(0, len(vocab), size=n_edit)
                suffix = f"_v{m}"
            org = int(rng.integers(0, 50))
            rows_repo.append(f"org{org}/repo{int(rng.integers(0, 200))}")
            rows_path.append(f"src/{lang}/{base_name}{suffix}.{lang}")
            rows_lang.append(lang)
            rows_content.append(" ".join(vocab[toks]))
            rows_family.append(fam)

    # regular families
    fam = 0
    remaining = n_family_rows
    while remaining > 0:
        size = int(np.clip(rng.poisson(avg_family - 1) + 2, 2, 12))
        size = min(size, remaining) if remaining - size >= 2 or remaining == size else remaining
        lang = LANGS[rng.choice(len(LANGS), p=LANG_WEIGHTS)]
        tlen = int(rng.integers(80, 240))
        template = rng.integers(0, len(vocab), size=tlen)
        family_members(fam, size, lang, template)
        fam += 1
        remaining -= size

    # vendored hot key: ONE content shared by ~vendored_frac of all rows
    vend_template = rng.integers(0, len(vocab), size=150)
    vend_content = " ".join(vocab[vend_template])
    vend_fam = fam
    fam += 1
    for i in range(n_vendored):
        rows_repo.append(f"org{i % 60}/repo{900 + i % 90}")
        rows_path.append("vendor/lib/left_pad.js")
        rows_lang.append("js")
        rows_content.append(vend_content)
        rows_family.append(vend_fam)

    # singletons (unrelated)
    for i in range(n_singletons):
        lang = LANGS[rng.choice(len(LANGS), p=LANG_WEIGHTS)]
        tlen = int(rng.integers(40, 160))
        toks = rng.integers(0, len(vocab), size=tlen)
        rows_repo.append(f"org{int(rng.integers(0, 50))}/repo{int(rng.integers(0, 200))}")
        rows_path.append(f"src/{lang}/single_{i}.{lang}")
        rows_lang.append(lang)
        rows_content.append(" ".join(vocab[toks]))
        rows_family.append(fam + i)

    n = len(rows_content)
    commits = [_hex40(f"{seed}:{r}:{p}:{i}".encode()) for i, (r, p) in enumerate(zip(rows_repo, rows_path))]
    row_ids = stable_id64_list(rows_repo, rows_path, commits)
    sha = sha256_hex_list(rows_content)

    files = pa.table({
        "row_id": pa.array(row_ids, pa.int64()),
        "repo": pa.array(rows_repo, pa.string()),
        "path": pa.array(rows_path, pa.string()),
        "commit": pa.array(commits, pa.string()),
        "lang": pa.array(rows_lang, pa.string()),
        "content": pa.array(rows_content, pa.string()),
        "content_sha256": pa.array(sha, pa.string()),
    })

    # ---- gold clusters: cluster_id = min row_id of the family ----
    family = np.asarray(rows_family)
    order = np.argsort(row_ids, kind="stable")
    cluster_of: dict[int, int] = {}
    for idx in order:  # first (=min row_id) seen per family wins
        cluster_of.setdefault(family[idx], int(row_ids[idx]))
    gold_clusters = pa.table({
        "row_id": pa.array(row_ids, pa.int64()),
        "cluster_id": pa.array([cluster_of[f] for f in family], pa.int64()),
    })

    # ---- gold pairs: capped within-family positives + matched negatives ----
    pos_a, pos_b, labels, block_keys = [], [], [], []
    fam_rows: dict[int, list[int]] = {}
    for i, f in enumerate(family):
        fam_rows.setdefault(int(f), []).append(i)
    fam_by_lang: dict[str, list[int]] = {}
    for f, members in fam_rows.items():
        if len(members) > 1:
            fam_by_lang.setdefault(rows_lang[members[0]], []).append(f)

    def add_pair(i: int, j: int, label: int):
        a, b = int(row_ids[i]), int(row_ids[j])
        if a == b:
            return
        if a > b:
            a, b = b, a
        pos_a.append(a)
        pos_b.append(b)
        labels.append(label)
        block_keys.append(rows_lang[i])

    for f, members in fam_rows.items():
        if len(members) < 2:
            continue
        m = len(members)
        n_all = m * (m - 1) // 2
        if n_all <= max_gold_pairs_per_family:
            all_pairs = [(members[i], members[j])
                         for i in range(m) for j in range(i + 1, m)]
        else:
            # sample pair INDICES directly — never materialize the n^2
            # pair list (the vendored hot family has 10^4+ members)
            sel = rng.choice(n_all, size=max_gold_pairs_per_family,
                             replace=False)
            all_pairs = []
            for s in sel:
                # unrank combination index s -> (i, j), i < j
                i = int((2 * m - 1 - np.sqrt((2 * m - 1) ** 2 - 8 * s)) // 2)
                j = int(s - i * (2 * m - i - 1) // 2 + i + 1)
                all_pairs.append((members[i], members[j]))
        for i, j in all_pairs:
            add_pair(i, j, 1)
        # matched-block negatives: another family in the same lang
        lang = rows_lang[members[0]]
        cands = fam_by_lang.get(lang, [])
        if len(cands) > 1:
            for _ in range(min(3, len(all_pairs))):
                g = int(cands[rng.integers(0, len(cands))])
                if g == f:
                    continue
                add_pair(members[int(rng.integers(0, len(members)))],
                         fam_rows[g][int(rng.integers(0, len(fam_rows[g])))], 0)

    gold_pairs = pa.table({
        "id_a": pa.array(pos_a, pa.int64()),
        "id_b": pa.array(pos_b, pa.int64()),
        "block_key": pa.array(block_keys, pa.string()),
        "label": pa.array(labels, pa.int8()),
    })

    # ---- KB-analog tables (F4-F6) over family identifiers ----
    syn_uid, syn_id, syn_name, syn_desc, syn_fk = [], [], [], [], []
    uid = 0
    shared_name_pool = [f"util_{i}" for i in range(max(4, n_families // 10))]
    for f in sorted(fam_rows):
        if len(fam_rows[f]) < 2:
            continue
        lang_id_ = LANGS.index(rows_lang[fam_rows[f][0]])
        names = [f"mod_{f}", f"module_{f}"]
        if rng.random() < 0.4:  # homonym: name shared across identifiers
            names.append(shared_name_pool[int(rng.integers(0, len(shared_name_pool)))])
        if rng.random() < 0.3:  # duplicate (identifier, name) row → dedup fixture
            names.append(names[0])
        for d, name in enumerate(names):
            syn_uid.append(uid)
            syn_id.append(f)
            syn_name.append(name)
            syn_desc.append(0 if d == 0 else min(d, 3))
            syn_fk.append(lang_id_)
            uid += 1
    synonyms = pa.table({
        "uid": pa.array(syn_uid, pa.int64()),
        "identifier": pa.array(syn_id, pa.int64()),
        "name": pa.array(syn_name, pa.string()),
        "description": pa.array(syn_desc, pa.int32()),
        "foreign_identifier": pa.array(syn_fk, pa.int64()),
    })

    # history: redirects among retired ids; includes 2-hop chains + obsolete
    fams = sorted(f for f in fam_rows if len(fam_rows[f]) >= 2)
    old_ids, new_ids = [], []
    for i, f in enumerate(fams[: max(4, len(fams) // 5)]):
        retired = 10_000_000 + f
        if i % 3 == 0:  # 2-hop: old → mid → f
            mid = 20_000_000 + f
            old_ids += [str(retired), str(mid)]
            new_ids += [str(mid), str(f)]
        elif i % 3 == 1:
            old_ids.append(str(retired))
            new_ids.append(str(f))
        else:  # obsolete sentinel (belb/preprocessing/data.py:24)
            old_ids.append(str(retired))
            new_ids.append("-1")
    history = pa.table({
        "old_identifier": pa.array(old_ids, pa.string()),
        "new_identifier": pa.array(new_ids, pa.string()),
    })

    # id_mapping: many-to-one EXT ids → internal identifier
    orig, internal = [], []
    for f in fams[: max(4, len(fams) // 4)]:
        orig.append(f"EXT:{f:06d}")
        internal.append(f)
        if f % 2 == 0:
            orig.append(f"ALT:{f:06d}")
            internal.append(f)
    id_mapping = pa.table({
        "original_identifier": pa.array(orig, pa.string()),
        "internal_identifier": pa.array(internal, pa.int64()),
    })

    n_exact_dup_rows = n - len(set(sha))
    counters = pa.table({
        "stat": pa.array(["rows_in", "distinct_contents", "exact_dup_rows",
                          "n_families", "n_clusters_gt1"], pa.string()),
        "value": pa.array([n, len(set(sha)), n_exact_dup_rows, n_families,
                           sum(1 for m in fam_rows.values() if len(m) > 1)], pa.int64()),
    })

    return {
        "files": files,
        "gold_pairs": gold_pairs,
        "gold_clusters": gold_clusters,
        "synonyms": synonyms,
        "history": history,
        "id_mapping": id_mapping,
        "expected_counters": counters,
    }


def write_fixture(out_dir: str, n_files: int = 5000, seed: int = 42, **kw) -> dict[str, str]:
    """Write all fixture tables as parquet under out_dir; returns paths."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    tables = make_fixture(n_files=n_files, seed=seed, **kw)
    paths = {}
    for name, tbl in tables.items():
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, p)
        paths[name] = p
    return paths
