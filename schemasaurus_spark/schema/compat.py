"""Static schema-compatibility analysis: classify every keyword change
between two draft-4 schemas as widening / narrowing / incomparable WITHOUT
touching data — the ex-ante twin of ``schema/migration.py``'s measured
impact.

A 10^12-doc corpus scan (even a cheap one) is the wrong first tool for
"can I ship this schema change": most migrations can be judged from the
schemas alone.  The analyzer walks both versions in lockstep over the
keyword set the engine's validators support (SURVEY.md §2B) and emits a
``Delta`` per changed constraint:

* ``widening``     — the new constraint accepts a superset of the old
  (enum gained members, maximum raised, required dropped, ...): can never
  regress a valid document;
* ``narrowing``    — accepts a subset (bound tightened, required added,
  property forbidden, ...): valid docs MAY regress;
* ``incomparable`` — accept-sets not statically ordered (pattern
  rewritten, combinator restructured, multipleOf to a non-divisor ratio).

Soundness contract (the only guarantee worth having, tested differentially
against the reference-parity walker in tests/test_compat.py):
``is_backward_compatible(old, new)`` returns True ONLY when every delta is
a widening — and then NO instance valid under ``old`` can be invalid under
``new``.  The converse direction is deliberately conservative: a reported
narrowing/incomparable is a *may*-break, the cue to run the measured
``migration_matrix`` on (a sample of) the corpus.

Driver-side only — no Spark, no data; cost is O(schema size).
"""

from __future__ import annotations

from dataclasses import dataclass

# "integer" instances are also "number" instances — the one subtype edge
# in draft-4's type lattice
_TYPE_WIDER = {("integer", "number")}


@dataclass(frozen=True)
class Delta:
    path: str  # JSON pointer of the schema node ('' = root)
    keyword: str
    kind: str  # 'widening' | 'narrowing' | 'incomparable'
    old: object
    new: object


def _types(schema: dict) -> set | None:
    t = schema.get("type")
    if t is None:
        return None
    return set(t) if isinstance(t, list) else {t}


def _type_covers(new_types: set, old_t: str) -> bool:
    return old_t in new_types or any(
        (old_t, wider) in _TYPE_WIDER for wider in new_types
    )


def _required_names(schema: dict) -> set:
    """v4 list + v3 per-property boolean, the same merge the validators do."""
    req = set(schema.get("required") or []) if isinstance(
        schema.get("required"), list
    ) else set()
    for name, sub in (schema.get("properties") or {}).items():
        if isinstance(sub, dict) and sub.get("required") is True:
            req.add(name)
    return req


def _cmp_bound(deltas, path, kw, old_v, new_v, tighter_when_greater):
    """min*-style bounds tighten upward, max*-style tighten downward;
    an absent bound is the loosest possible value."""
    if old_v == new_v:
        return
    if old_v is None:
        deltas.append(Delta(path, kw, "narrowing", old_v, new_v))
    elif new_v is None:
        deltas.append(Delta(path, kw, "widening", old_v, new_v))
    elif (new_v > old_v) == tighter_when_greater:
        deltas.append(Delta(path, kw, "narrowing", old_v, new_v))
    else:
        deltas.append(Delta(path, kw, "widening", old_v, new_v))


_MIN_BOUNDS = ("minLength", "minItems", "minProperties")
_MAX_BOUNDS = ("maxLength", "maxItems", "maxProperties")
_OPAQUE = (
    "allOf",
    "anyOf",
    "oneOf",
    "not",
    "dependencies",
    "$ref",
    "conform",
    "patternProperties",
    "definitions",  # a changed definition narrows through an UNCHANGED $ref
)


def _node_delta(old: dict, new: dict, path: str, deltas: list) -> None:
    # ---- type
    ot, nt = _types(old), _types(new)
    if ot != nt:
        if nt is None or (ot is not None and all(_type_covers(nt, t) for t in ot)):
            deltas.append(Delta(path, "type", "widening", old.get("type"), new.get("type")))
        elif ot is None:
            deltas.append(Delta(path, "type", "narrowing", old.get("type"), new.get("type")))
        elif all(_type_covers(ot, t) for t in nt):
            deltas.append(Delta(path, "type", "narrowing", old.get("type"), new.get("type")))
        else:
            deltas.append(Delta(path, "type", "incomparable", old.get("type"), new.get("type")))

    # ---- enum (structural membership; list order is irrelevant)
    oe, ne = old.get("enum"), new.get("enum")
    if oe != ne:
        def _keyed(vals):
            import json

            return {json.dumps(v, sort_keys=True) for v in vals}

        if oe is None:
            deltas.append(Delta(path, "enum", "narrowing", oe, ne))
        elif ne is None:
            deltas.append(Delta(path, "enum", "widening", oe, ne))
        else:
            ok, nk = _keyed(oe), _keyed(ne)
            if ok == nk:
                pass
            elif ok <= nk:
                deltas.append(Delta(path, "enum", "widening", oe, ne))
            else:
                deltas.append(Delta(path, "enum", "narrowing", oe, ne))

    # ---- numeric bounds (+ exclusivity: adding exclusive tightens)
    for kw, excl_kw, greater_tightens in (
        ("minimum", "exclusiveMinimum", True),
        ("maximum", "exclusiveMaximum", False),
    ):
        ov, nv = old.get(kw), new.get(kw)
        oex = bool(old.get(excl_kw, False)) and ov is not None
        nex = bool(new.get(excl_kw, False)) and nv is not None
        if ov == nv and oex != nex:
            deltas.append(
                Delta(path, excl_kw, "narrowing" if nex else "widening", oex, nex)
            )
        elif ov != nv:
            _cmp_bound(deltas, path, kw, ov, nv, greater_tightens)
            if oex != nex and ov is not None and nv is not None:
                # bound moved AND exclusivity flipped: orderings can conflict
                # (e.g. minimum 5 exclusive -> minimum 5.5 inclusive); the
                # bound delta above already reports the dominant direction,
                # flag the flip as incomparable unless it agrees
                deltas.append(Delta(path, excl_kw, "incomparable", oex, nex))

    # ---- length/size bounds
    for kw in _MIN_BOUNDS:
        if old.get(kw) != new.get(kw):
            _cmp_bound(deltas, path, kw, old.get(kw), new.get(kw), True)
    for kw in _MAX_BOUNDS:
        if old.get(kw) != new.get(kw):
            _cmp_bound(deltas, path, kw, old.get(kw), new.get(kw), False)

    # ---- pattern / format: only add/remove are statically ordered
    for kw in ("pattern", "format"):
        ov, nv = old.get(kw), new.get(kw)
        if ov != nv:
            if ov is None:
                deltas.append(Delta(path, kw, "narrowing", ov, nv))
            elif nv is None:
                deltas.append(Delta(path, kw, "widening", ov, nv))
            else:
                deltas.append(Delta(path, kw, "incomparable", ov, nv))

    # ---- multipleOf: divisibility decides the ordering
    ok_, nk_ = old.get("multipleOf"), new.get("multipleOf")
    if ok_ != nk_:
        if ok_ is None:
            deltas.append(Delta(path, "multipleOf", "narrowing", ok_, nk_))
        elif nk_ is None:
            deltas.append(Delta(path, "multipleOf", "widening", ok_, nk_))
        elif (ok_ / nk_) == int(ok_ / nk_):  # new divides old -> superset
            deltas.append(Delta(path, "multipleOf", "widening", ok_, nk_))
        elif (nk_ / ok_) == int(nk_ / ok_):  # old divides new -> subset
            deltas.append(Delta(path, "multipleOf", "narrowing", ok_, nk_))
        else:
            deltas.append(Delta(path, "multipleOf", "incomparable", ok_, nk_))

    # ---- uniqueItems
    ou, nu = bool(old.get("uniqueItems", False)), bool(new.get("uniqueItems", False))
    if ou != nu:
        deltas.append(
            Delta(path, "uniqueItems", "narrowing" if nu else "widening", ou, nu)
        )

    # ---- required set (v4 list + v3 boolean merged)
    oreq, nreq = _required_names(old), _required_names(new)
    for name in sorted(nreq - oreq):
        deltas.append(Delta(path, "required", "narrowing", None, name))
    for name in sorted(oreq - nreq):
        deltas.append(Delta(path, "required", "widening", name, None))

    # ---- additionalProperties: three-valued lattice False < {schema} < True.
    # A schema-valued additionalProperties is enforced by the validators
    # (columns.py additional-property dispatch), so it must participate in
    # the ordering — two differing schema values are statically incomparable
    # (same treatment as the _OPAQUE keywords), never silently equal.
    oap = old.get("additionalProperties", True)
    nap = new.get("additionalProperties", True)
    if oap != nap:
        oap_dict, nap_dict = isinstance(oap, dict), isinstance(nap, dict)
        if oap_dict and nap_dict:
            kind = "incomparable"  # differing subschemas: not statically ordered
        elif nap is False:
            kind = "narrowing"  # anything -> forbidden
        elif oap is False:
            kind = "widening"  # forbidden -> anything permitted is a superset
        elif nap_dict:
            kind = "narrowing"  # unconstrained (True/absent) -> constrained
        elif oap_dict:
            kind = "widening"  # constrained -> unconstrained (True/absent)
        else:
            kind = None  # True vs absent: same accept-set, no delta
        if kind is not None:
            deltas.append(Delta(path, "additionalProperties", kind, oap, nap))

    # ---- opaque combinators: equality or bust
    for kw in _OPAQUE:
        if old.get(kw) != new.get(kw):
            deltas.append(Delta(path, kw, "incomparable", old.get(kw), new.get(kw)))

    # ---- recurse: properties
    oprops = old.get("properties") or {}
    nprops = new.get("properties") or {}
    for name in sorted(set(oprops) | set(nprops)):
        child = f"{path}/{name}"
        osub, nsub = oprops.get(name), nprops.get(name)
        if osub is not None and nsub is not None:
            _node_delta(osub, nsub, child, deltas)
        elif osub is None:
            # newly declared property: instances carrying the key were
            # previously unconstrained (additionalProperties permitting),
            # now validated -> may-break unless the new subschema is vacuous
            sub = {k: v for k, v in nsub.items() if k != "required"}
            if sub:
                deltas.append(Delta(child, "properties", "narrowing", None, nsub))
            # required-ness itself was already reported above
        else:
            # property undeclared in new: the key's values fall through to
            # new additionalProperties — widening only when that is
            # unconstrained (True/absent); forbidden (False) narrows; a
            # schema-valued additionalProperties re-validates the values
            # against an arbitrary subschema, which is not statically
            # ordered against the removed declaration
            if nap is False:
                kind = "narrowing"
            elif isinstance(nap, dict):
                kind = "incomparable"
            else:
                kind = "widening"
            deltas.append(Delta(child, "properties", kind, osub, None))

    # ---- recurse: items (homogeneous dict form; tuple forms are opaque)
    oi, ni = old.get("items"), new.get("items")
    if isinstance(oi, dict) and isinstance(ni, dict):
        _node_delta(oi, ni, f"{path}/items", deltas)
    elif oi != ni:
        if oi is None and isinstance(ni, dict):
            deltas.append(Delta(f"{path}/items", "items", "narrowing", oi, ni))
        elif ni is None and isinstance(oi, dict):
            deltas.append(Delta(f"{path}/items", "items", "widening", oi, ni))
        else:
            deltas.append(Delta(f"{path}/items", "items", "incomparable", oi, ni))
    if old.get("additionalItems") != new.get("additionalItems"):
        oai_f = old.get("additionalItems") is not False
        nai_f = new.get("additionalItems") is not False
        if oai_f != nai_f:
            deltas.append(
                Delta(
                    path,
                    "additionalItems",
                    "narrowing" if not nai_f else "widening",
                    old.get("additionalItems"),
                    new.get("additionalItems"),
                )
            )
        else:
            deltas.append(
                Delta(
                    path,
                    "additionalItems",
                    "incomparable",
                    old.get("additionalItems"),
                    new.get("additionalItems"),
                )
            )


def schema_delta(old_schema: dict, new_schema: dict) -> list[Delta]:
    """Every statically-classifiable constraint change, as a flat list of
    ``Delta(path, keyword, kind, old, new)`` sorted by (path, keyword)."""
    deltas: list[Delta] = []
    _node_delta(old_schema, new_schema, "", deltas)
    return sorted(deltas, key=lambda d: (d.path, d.keyword))


def is_backward_compatible(old_schema: dict, new_schema: dict) -> bool:
    """True only when EVERY delta widens — then no instance valid under
    ``old_schema`` can be invalid under ``new_schema`` (sound; see module
    doc).  False means *may* break: measure with migration_matrix."""
    return all(d.kind == "widening" for d in schema_delta(old_schema, new_schema))
