"""Docs performance-claim drift gate (VERDICT r4 weak 2 / do-item 4).

The api.md gate (test_doctests.py) only protects *name* coverage;
performance claims rotted silently across rounds (the round-2 divisor
packing and "PRNG-throughput-bound" notes survived two rounds after being
measured false).  This gate pins every headline number in
docs/architecture.md and docs/performance.md to the committed artifact it
came from:

- ``CLAIMS`` rows assert (a) the claim text is still present in the doc
  (edit the doc -> update the pin here, consciously) and (b) the artifact
  value still matches the stated number within tolerance (re-run the
  bench with materially different results -> gate goes red until the doc
  is updated).
- ``BANNED`` rows are measured-false claims that must never reappear.
- every ``*.json`` artifact a doc cites must exist at the repo root.
"""

import json
import re
from pathlib import Path

import pytest

ROOT = Path(__file__).parent.parent

# (doc, substring that must appear, artifact file, key path, stated, rtol)
# key path "a.b" indexes nested dicts; artifact None = presence-only claim.
CLAIMS = [
    # architecture.md — kernel layer
    ("docs/architecture.md", "(rows, 128)", "HBM_ROOF.json", None, None, None),
    (
        "docs/architecture.md",
        "~0.20 s",
        "BENCH_KERNELS.json",
        "bootstrap_poisson_R1e8_nrep256.wallclock_s",
        0.202,
        0.25,
    ),
    (
        "docs/architecture.md",
        "96% of its structural floor",
        "POISSON_DECOMP.json",
        "full_f32_grep_samples_per_s",
        135.4,
        0.2,
    ),
    (
        "docs/architecture.md",
        "707",
        "POISSON_DECOMP.json",
        "draw_grep_samples_per_s",
        707.3,
        0.2,
    ),
    (
        "docs/architecture.md",
        "0.22 s",
        "BENCH_PIPELINE.json",
        "extrap_predict_ci_f32.wallclock_s",
        0.219,
        0.25,
    ),
    (
        "docs/architecture.md",
        "45 ms",
        "BENCH_PIPELINE.json",
        "lnpi_grid_predict_ci.wallclock_s",
        0.0446,
        0.3,
    ),
    # performance.md — perturbation section (round 5)
    (
        "docs/performance.md",
        "3.3e-7 max relative",
        "PERTURB_DECOMP.json",
        "gate_kernel_vs_hostf64_max_rel",
        3.3e-7,
        3.0,
    ),
    (
        "docs/performance.md",
        "3.1e-4",
        "PERTURB_DECOMP.json",
        "gate_einsum_vs_hostf64_max_rel",
        3.07e-4,
        0.5,
    ),
    (
        "docs/performance.md",
        "**12.1 ms**",
        "PERTURB_DECOMP.json",
        "device_full_ci_s_per_call",
        0.01214,
        0.3,
    ),
    (
        "docs/performance.md",
        "**105.4 G**",
        "PERTURB_DECOMP.json",
        "device_full_ci_greps_bench_units",
        105.4,
        0.3,
    ),
    (
        "docs/performance.md",
        "38.9 ms | 32.9 G",
        "PERTURB_DECOMP.json",
        "device_old_body_greps_bench_units",
        32.9,
        0.3,
    ),
    # performance.md — headline rates
    (
        "docs/performance.md",
        "~861 GB/s",
        "HBM_ROOF.json",
        "roof_sum_f32_gbps",
        860.9,
        0.1,
    ),
    (
        "docs/performance.md",
        "**0.163",
        "BENCH_FREQ_V2.json",
        "w_v2t_rb128_device_treps",
        0.189,
        0.35,
    ),
    (
        "docs/performance.md",
        "**0.20 s**",
        "BENCH_KERNELS.json",
        "bootstrap_poisson_R1e8_nrep256.wallclock_s",
        0.202,
        0.25,
    ),
    (
        "docs/performance.md",
        "**135.4 G**",
        "POISSON_DECOMP.json",
        "full_f32_grep_samples_per_s",
        135.4,
        0.15,
    ),
    (
        "docs/performance.md",
        "~1084 G",
        "PRNG_ROOF.json",
        None,
        None,
        None,
    ),
    (
        "docs/performance.md",
        "367",
        "BENCH_PIPELINE.json",
        "lnpi_grid_predict_ci.grep_samples_per_s",
        367.36,
        0.25,
    ),
    (
        "docs/performance.md",
        "**1.06 G",
        "GPR_SERVING.json",
        None,
        None,
        None,
    ),
    (
        "docs/performance.md",
        "0.017–0.02 GB/s",
        "INGEST_ROOF.json",
        "roof_put_gbps",
        0.02,
        0.35,
    ),
    (
        "docs/performance.md",
        "put 99.2% / device update 0.1%",
        "INGEST_ROOF.json",
        "streaming_fan8_decomp.put_pct_of_full",
        99.2,
        0.05,
    ),
    (
        "docs/performance.md",
        "2.27 T issue/s",
        "VPU_ISSUE_ROOF.json",
        None,
        None,
        None,
    ),
]

# measured-false claims that must never reappear (each was shipped in an
# earlier round and later falsified on chip)
BANNED = [
    ("docs/architecture.md", "(R/1024, 1024)"),
    ("docs/architecture.md", "PRNG-throughput-bound"),
    ("docs/architecture.md", "512 × 1e6 ≈ 49 ms"),
    ("docs/performance.md", "(R/1024, 1024)"),
    ("CLAUDE.md", "(R/1024, 1024)"),
]


def _lookup(obj, keypath):
    for k in keypath.split("."):
        obj = obj[k]
    return obj


@pytest.mark.parametrize(
    "doc,needle,artifact,keypath,stated,rtol",
    CLAIMS,
    ids=[f"{c[0].split('/')[-1]}:{c[1][:24]}" for c in CLAIMS],
)
def test_claim_pinned(doc, needle, artifact, keypath, stated, rtol):
    text = (ROOT / doc).read_text()
    assert needle in text, (
        f"{doc}: claim {needle!r} edited or removed — update the CLAIMS pin"
    )
    if artifact is not None:
        path = ROOT / artifact
        assert path.exists(), f"{doc} cites {artifact} which does not exist"
        if keypath is not None:
            value = float(_lookup(json.loads(path.read_text()), keypath))
            assert abs(value - stated) <= rtol * abs(stated), (
                f"{artifact}:{keypath} = {value} drifted from the "
                f"{stated} stated in {doc} — update the doc + pin"
            )


@pytest.mark.parametrize("doc,phrase", BANNED, ids=[b[1][:24] for b in BANNED])
def test_banned_stale_claims(doc, phrase):
    assert phrase not in (ROOT / doc).read_text(), (
        f"{doc}: measured-false claim {phrase!r} reappeared"
    )


def test_cited_artifacts_exist():
    """Every *.json artifact a doc mentions must be committed."""
    missing = []
    for doc in ("docs/architecture.md", "docs/performance.md", "docs/serving.md"):
        text = (ROOT / doc).read_text()
        for name in set(re.findall(r"\b([A-Z][A-Z0-9_]+\.json)\b", text)):
            if not (ROOT / name).exists():
                missing.append((doc, name))
    assert not missing, f"docs cite missing artifacts: {missing}"
