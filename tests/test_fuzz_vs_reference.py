"""Differential fuzz against the LIVE reference implementation: random
(schema, instance) pairs run through both our walker and the actual
reference (node + /root/reference/src), asserting

* identical ordered (code, path) error lists from the validator, and
* identical normalizer outputs (defaults + type coercions),

on instances that deliberately include WRONG-typed values for every field
(something the Spark-typed fuzz in test_fuzz_parity.py cannot express).
This is the strongest parity check available offline — the reference
itself is the oracle, not an authored expectation.

Skipped where node or the reference checkout is unavailable.  Known
deviations are kept out of the generated space: shared-$ref diamonds and
``anyOf: []`` (reference miscompiles/crashes there — documented in
walker.py / the corpus test), and value coercions whose JS-vs-Python
float-printing differs are canonicalized before comparison.
"""

import json
import math
import os
import random
import shutil
import subprocess

import pytest

from schemasaurus_spark import new_normalizer, new_validator
from tests.test_fuzz_parity import FIELDS, field_schema, root_schema

pytestmark = pytest.mark.skipif(
    shutil.which("node") is None or not os.path.isdir("/root/reference/src"),
    reason="node or reference checkout unavailable",
)

HARNESS = os.path.join(os.path.dirname(__file__), "..", "tools", "reference_fuzz.js")

# mixed-type value pool: every field can receive any of these, so type
# checks, coercions and combinator branches all fire on wrong-typed input
MIXED = [
    "", "a", "abc", "a1", "0123456789", "22.2", "true", "on", "off",
    -1.5, -1.0, 0.0, 0.5, 1.0, 2.0, 2.5, 3.0, 7.0,
    -3, 0, 1, 2, 5, 10,
    True, False,
    [], [1, 2], [1, 1], ["a"], [0, False],
    {}, {"x": 1}, {"y": "a"}, {"x": 1, "y": "a"}, {"q": 3},
]


def gen_mixed_instance(rng):
    row = {}
    for k in FIELDS:
        if rng.random() < 0.8:
            if k == "b" and rng.random() < 0.7:
                # bias the boolean-schema field toward strings: any other
                # type crashes the REFERENCE's coercion (toLowerCase),
                # aborting its normalizer walk and skipping the comparison
                # for the whole instance — strings keep it comparable
                row[k] = rng.choice(["true", "false", "on", "off", "x", ""])
            else:
                row[k] = rng.choice(MIXED)
    return row


def with_defaults(rng, schema):
    """Inject normalizer fodder: defaults on missing-prone properties."""
    pool = {
        "s": ["dflt", ""],
        "n": [1.5, 0.0],
        "i": [2, 0],
        "b": [True, False],
        "arr": [[1, 2]],
        "o": [{"x": 1}],
    }
    for k, sub in schema.get("properties", {}).items():
        if isinstance(sub, dict) and rng.random() < 0.5 and k in pool:
            sub["default"] = rng.choice(pool[k])
    return schema


def canon(v):
    """JSON.stringify-equivalent canonical form: NaN/Inf -> null (what the
    node harness emits), ints and floats unified."""
    if isinstance(v, bool):
        return v
    if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
        return None
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, dict):
        return {k: canon(x) for k, x in v.items()}
    if isinstance(v, list):
        return [canon(x) for x in v]
    return v


def walker_result(validator, doc):
    res = validator(json.loads(json.dumps(doc)))
    return [(e["code"], [str(c) for c in e["path"]]) for e in res["errors"]]


def add_ref_chains(rng, schema):
    """Round-4 space extension (verdict item): lift some property schemas
    into ``#/definitions`` behind 1- or 2-hop ``$ref`` chains.  Each
    definition is referenced exactly ONCE across the schema — the
    reference's leaked ``$$visited`` recursion marker miscompiles SHARED
    refs (documented deviation, kept out of the generated space like the
    shared-$ref diamonds)."""
    defs = {}
    for k in list(schema.get("properties", {})):
        r = rng.random()
        if r < 0.45:
            target = schema["properties"][k]
            name = f"def_{k}"
            defs[name] = target
            if r < 0.2:
                # two-hop chain: property -> hop -> definition
                defs[f"{name}_hop"] = {"$ref": f"#/definitions/{name}"}
                schema["properties"][k] = {"$ref": f"#/definitions/{name}_hop"}
            else:
                schema["properties"][k] = {"$ref": f"#/definitions/{name}"}
    if defs:
        schema["definitions"] = defs
    return schema


def tuple_items_schema(rng):
    """Tuple-form array schema: positional ``items`` list + the three
    ``additionalItems`` modes (absent / false / schema), sometimes with a
    nested tuple in slot 0."""
    slots = [
        field_schema(rng, rng.choice(["i", "s", "n"]), depth=1)
        for _ in range(rng.randint(1, 3))
    ]
    base = {"type": "array", "items": slots}
    r = rng.random()
    if r < 0.4:
        base["additionalItems"] = False
    elif r < 0.7:
        base["additionalItems"] = {"type": "integer", "minimum": 0}
    if rng.random() < 0.3:
        slots[0] = {
            "type": "array",
            "items": [{"type": "string"}],
            "additionalItems": False,
        }
    if rng.random() < 0.3:
        base["minItems"] = rng.randint(0, 2)
    return base


# arrays shaped to exercise tuple slots + additionalItems tails
TUPLEISH = [
    [1, "a", 2.5, True], ["a", "b", "c"], [1], [1, 2, 3, 4, 5],
    [[1], "x"], [["a"], 2], [2.5, 0], [True, {}, "q"],
]


def _assert_groups_match_reference(groups, seed):
    path = f"/tmp/ref_fuzz_{os.getpid()}_{seed}.json"
    with open(path, "w") as f:
        json.dump(groups, f)
    try:
        res = subprocess.run(
            ["node", HARNESS, path], capture_output=True, text=True, check=True
        )
    finally:
        os.remove(path)
    ref_out = json.loads(res.stdout)
    for gi, (g, ref_g) in enumerate(zip(groups, ref_out)):
        validator = new_validator(g["schema"])
        normalizer = new_normalizer(json.loads(json.dumps(g["schema"])))
        for ii, inst in enumerate(g["instances"]):
            ctx = f"seed={seed} group={gi} inst={ii}\nschema={g['schema']}\ninstance={inst}"
            ours = walker_result(validator, inst)
            refs = [(e["code"], e["path"]) for e in ref_g["errors"][ii]]
            assert ours == refs, f"validator diverged:\nours={ours}\nref ={refs}\n{ctx}"
            refs_n = ref_g["normalized"][ii]
            if isinstance(refs_n, dict) and "$crash" in refs_n:
                msg = refs_n["$crash"]
                if "toLowerCase" in msg:
                    # reference throws on boolean coercion of any
                    # non-string (normalizer.js:32 object.toLowerCase());
                    # ours totalizes to JS truthiness — a deliberate
                    # don't-copy-the-crash deviation.  Ours either
                    # completes, or hits a LATER faithful crash (string
                    # item replace) the aborted reference never reached.
                    try:
                        normalizer(json.loads(json.dumps(inst)))
                    except TypeError:
                        pass
                elif "read only property" in msg:
                    # coercing a string's characters in place (items walk
                    # over a string value) — immutable both sides: ours
                    # raises too, faithfully
                    with pytest.raises(TypeError):
                        normalizer(json.loads(json.dumps(inst)))
                else:
                    raise AssertionError(
                        f"unexpected reference crash: {msg}\n{ctx}"
                    )
                continue
            ours_n = canon(normalizer(json.loads(json.dumps(inst))))
            assert ours_n == canon(refs_n), (
                f"normalizer diverged:\nours={ours_n}\nref ={canon(refs_n)}\n{ctx}"
            )


@pytest.mark.parametrize("seed", [11, 77, 1234])
def test_fuzz_validator_and_normalizer_vs_reference(seed):
    rng = random.Random(seed)
    groups = []
    for _ in range(12):
        schema = with_defaults(rng, root_schema(rng))
        groups.append(
            {"schema": schema, "instances": [gen_mixed_instance(rng) for _ in range(10)]}
        )
    _assert_groups_match_reference(groups, seed)


@pytest.mark.parametrize("seed", [5, 55, 555])
def test_fuzz_ref_chains_and_tuples_vs_reference(seed):
    """Round-4 extension of the generated space (verdict item #7):
    $ref-through-definitions chains (1 and 2 hops, each definition
    referenced once) and tuple-form items with every additionalItems mode,
    including nested tuples — the shapes the authored corpus covered only
    thinly.  Same oracle: the live reference."""
    rng = random.Random(seed)
    groups = []
    for _ in range(12):
        schema = root_schema(rng)
        if rng.random() < 0.8:
            schema["properties"]["arr"] = tuple_items_schema(rng)
        schema = add_ref_chains(rng, with_defaults(rng, schema))
        instances = []
        for _ in range(10):
            inst = gen_mixed_instance(rng)
            if rng.random() < 0.7:
                inst["arr"] = rng.choice(TUPLEISH)
            instances.append(inst)
        groups.append({"schema": schema, "instances": instances})
    _assert_groups_match_reference(groups, seed)


def pattern_props_schema(rng):
    """Round-5 space extension (verdict item #6): patternProperties x
    additionalProperties interplay — overlapping patterns, a declared
    property that also matches a pattern, and all three
    additionalProperties modes over the leftover keys."""
    pats = {}
    for p in rng.sample(["^x", "^[xy]$", "q$", "^[a-z]{2}$"], rng.randint(1, 2)):
        pats[p] = field_schema(rng, rng.choice(["i", "s", "n"]), depth=1)
    base = {"type": "object", "patternProperties": pats}
    if rng.random() < 0.6:
        # declared property that may ALSO match a pattern (x matches ^x)
        base["properties"] = {
            rng.choice(["x", "zz"]): field_schema(rng, rng.choice(["i", "s"]), depth=1)
        }
    r = rng.random()
    if r < 0.35:
        base["additionalProperties"] = False
    elif r < 0.6:
        base["additionalProperties"] = field_schema(rng, rng.choice(["i", "s"]), depth=1)
    return base


# objects shaped to hit declared keys, pattern-matched keys (x/xy/yq/ab)
# and leftover keys, with wrong-typed values throughout
PATTERNISH_KEYS = ["x", "y", "xy", "yq", "ab", "zz", "other", "q"]


def gen_pattern_object(rng):
    obj = {}
    for k in rng.sample(PATTERNISH_KEYS, rng.randint(0, 5)):
        obj[k] = rng.choice(MIXED)
    return obj


def nested_tuple_schema(rng, depth=2):
    """Round-5 space extension: tuple-in-tuple chains with an
    ``additionalItems`` mode at EVERY level (absent / false / schema,
    where the schema tail may itself be a nested tuple)."""
    if depth == 0:
        return field_schema(rng, rng.choice(["i", "s", "n"]), depth=1)
    slots = [nested_tuple_schema(rng, depth - 1) for _ in range(rng.randint(1, 2))]
    base = {"type": "array", "items": slots}
    r = rng.random()
    if r < 0.35:
        base["additionalItems"] = False
    elif r < 0.65:
        base["additionalItems"] = nested_tuple_schema(rng, depth - 1)
    if rng.random() < 0.3:
        base["minItems"] = rng.randint(0, 2)
    return base


def gen_nested_array(rng, depth=3):
    if depth == 0 or rng.random() < 0.35:
        return rng.choice(MIXED)
    return [gen_nested_array(rng, depth - 1) for _ in range(rng.randint(0, 3))]


@pytest.mark.parametrize("seed", [21, 210, 2121])
def test_fuzz_pattern_props_and_nested_tuples_vs_reference(seed):
    """Round-5 extension of the generated space (verdict item #6, in lieu
    of the unvendorable official suite): patternProperties interacting
    with declared properties and every additionalProperties mode, plus
    tuple-in-tuple chains carrying additionalItems at every level.  Same
    oracle: the live reference under node."""
    rng = random.Random(seed)
    groups = []
    for _ in range(12):
        schema = root_schema(rng)
        schema["properties"]["pp"] = pattern_props_schema(rng)
        if rng.random() < 0.7:
            schema["properties"]["nt"] = nested_tuple_schema(
                rng, rng.randint(1, 3)
            )
        schema = with_defaults(rng, schema)
        instances = []
        for _ in range(10):
            inst = gen_mixed_instance(rng)
            if rng.random() < 0.8:
                inst["pp"] = gen_pattern_object(rng)
            if rng.random() < 0.7:
                inst["nt"] = gen_nested_array(rng)
            instances.append(inst)
        groups.append({"schema": schema, "instances": instances})
    _assert_groups_match_reference(groups, seed)
