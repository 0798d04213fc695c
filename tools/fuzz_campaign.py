"""Large-scale differential-fuzz campaign against the LIVE reference
implementation (runs /root/reference/src under node via
tools/reference_fuzz.js) — the reproducible form of the in-suite
tests/test_fuzz_vs_reference.py seeds.  Every generated schema group is
driven through BOTH the walker validator/normalizer and the reference,
asserting identical ordered (code, path) error lists and identical
normalizer output.

Usage:
    python tools/fuzz_campaign.py [n_seeds_per_family]   # default 250

Recorded runs: 2026-08-18, 250 seeds/family (500 total, 6,000 schema
groups, 60,000 instances): 0 divergences in 147 s.
2026-08-21 (round 5, with the pattern/nested family added): 250
seeds/family x 3 families (9,000 groups, 90,000 instances):
0 divergences in 153 s.
"""

from __future__ import annotations

import random
import sys
import time

sys.path.insert(0, ".")

from tests import test_fuzz_vs_reference as fz
from tests.test_fuzz_parity import root_schema


def mixed_family(seed: int) -> list:
    rng = random.Random(seed)
    return [
        {
            "schema": fz.with_defaults(rng, root_schema(rng)),
            "instances": [fz.gen_mixed_instance(rng) for _ in range(10)],
        }
        for _ in range(12)
    ]


def ref_tuple_family(seed: int) -> list:
    rng = random.Random(seed)
    groups = []
    for _ in range(12):
        schema = root_schema(rng)
        if rng.random() < 0.8:
            schema["properties"]["arr"] = fz.tuple_items_schema(rng)
        schema = fz.add_ref_chains(rng, fz.with_defaults(rng, schema))
        instances = []
        for _ in range(10):
            inst = fz.gen_mixed_instance(rng)
            if rng.random() < 0.7:
                inst["arr"] = rng.choice(fz.TUPLEISH)
            instances.append(inst)
        groups.append({"schema": schema, "instances": instances})
    return groups


def pattern_nested_family(seed: int) -> list:
    """Round 5: patternProperties x additionalProperties interplay +
    tuple-in-tuple chains with additionalItems at every level."""
    rng = random.Random(seed)
    groups = []
    for _ in range(12):
        schema = root_schema(rng)
        schema["properties"]["pp"] = fz.pattern_props_schema(rng)
        if rng.random() < 0.7:
            schema["properties"]["nt"] = fz.nested_tuple_schema(
                rng, rng.randint(1, 3)
            )
        schema = fz.with_defaults(rng, schema)
        instances = []
        for _ in range(10):
            inst = fz.gen_mixed_instance(rng)
            if rng.random() < 0.8:
                inst["pp"] = fz.gen_pattern_object(rng)
            if rng.random() < 0.7:
                inst["nt"] = fz.gen_nested_array(rng)
            instances.append(inst)
        groups.append({"schema": schema, "instances": instances})
    return groups


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    for name, gen, base in [
        ("mixed", mixed_family, 1000),
        ("ref/tuple", ref_tuple_family, 2000),
        ("pattern/nested", pattern_nested_family, 3000),
    ]:
        t0 = time.time()
        ng = 0
        for seed in range(base, base + n):
            groups = gen(seed)
            fz._assert_groups_match_reference(groups, seed)
            ng += len(groups)
        print(
            f"{name} campaign: {n} seeds, {ng} groups, 0 divergences, "
            f"{time.time() - t0:.1f}s"
        )


if __name__ == "__main__":
    main()
