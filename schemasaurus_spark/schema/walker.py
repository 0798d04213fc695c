"""Driver-side JSON-Schema (draft-4) compiler + walker.

This is the semantic heart of the engine — the Python re-expression of the
reference's compile-a-schema-into-a-specialized-walker pipeline
(/root/reference/src/compiler.js, src/int/processor.js, src/int/context.js):
the schema is walked **once at compile time** and partial-evaluated into a
tree of Python closures (enum hash-sets, compiled regexes, baked bounds);
no schema interpretation happens per value.

It serves three roles in the Spark engine:

1. exact-parity oracle for the reference's validator/normalizer fixtures
   (test/validator_spec.js, test/normalizer_spec.js, test/iterator_spec.js);
2. the generic-JSON fallback backend (wrapped in Arrow-batch ``mapInPandas``
   by ``schema.batch``) for payloads too dynamic for native Columns;
3. the specification that ``schema.columns`` (the native-Column scale
   backend) is property-tested against.

Intentional deviations from the reference (each documented inline):
* recursive ``$ref`` re-entry does **not** reset the error list — the
  reference accidentally calls ``begin()`` on re-entry (compiler.js:305-307)
  which drops errors collected before the recursion point; we keep them.
* reference crashes (``Object.keys(null)``, ``true.concat``,
  ``undefined.hasOwnProperty``) are turned into no-ops.
"""

from __future__ import annotations

import math
import re
from typing import Any, Callable

from schemasaurus_spark.schema.formats import fill_default_formats
from schemasaurus_spark.schema.js import (
    UNDEFINED,
    is_js_object,
    js_le,
    js_lt,
    js_ge,
    js_gt,
    js_property_key,
    js_parse_float,
    js_parse_int,
    js_string_length,
    js_to_string,
    js_truthy,
    js_typeof,
    to_comparable,
)
from schemasaurus_spark.schema.messages import messages as default_messages

# --------------------------------------------------------------------------
# runtime context — port of /root/reference/src/int/context.js
# --------------------------------------------------------------------------


class Context:
    """Walk state: instance path, parent container, current property/value."""

    __slots__ = ("path", "parent", "property", "self_", "_stack", "_stopped", "schema_only")

    def __init__(self, path=None):
        self.path: list = list(path) if path else []
        self.parent = None
        self.property = None
        self.self_ = None
        self._stack: list = []
        self._stopped = False
        self.schema_only = False

    def reset(self, path, value):
        self.path = list(path) if path else []
        self.self_ = value

    def push(self, prop, parent, self_):
        self.path.append(prop)
        self._stack.append((self.property, self.parent, self.self_))
        self.property, self.parent, self.self_ = prop, parent, self_

    def pop(self):
        self.path.pop()
        self.property, self.parent, self.self_ = self._stack.pop()

    def stop(self):
        self._stopped = True

    def is_stopped(self) -> bool:
        if self._stopped:
            self._stopped = False
            return True
        return False

    # normalizer mutation hooks (context.js:17-22)
    def replace(self, new_val):
        self.parent[self.property] = new_val

    def remove(self):
        del self.parent[self.property]


def _js_array_like_length(value) -> int:
    """JS ``val.length`` as the generated item loops read it
    (processor.js:38,55): arrays and strings have a real length; a plain
    object exposes whatever numeric-ish ``length`` property it carries
    (JS relational coercion: booleans and numeric strings count, anything
    NaN-ish compares false and iterates zero times); every other value has
    no length and iterates zero times."""
    if isinstance(value, (list, str)):
        return len(value)
    if isinstance(value, dict):
        n = value.get("length")
        if isinstance(n, bool):
            return 1 if n else 0
        if isinstance(n, (int, float)) and not math.isnan(n):
            return max(0, int(n))
        if isinstance(n, str):
            try:
                return max(0, int(float(n)))
            except ValueError:
                return 0
    return 0


def _js_index(value, i):
    """JS ``val[i]`` for the item-walk loops: sequence index for arrays and
    strings (a string yields its 1-char slices), stringified-key property
    lookup for objects, undefined for everything else."""
    if isinstance(value, (list, str)):
        return value[i] if 0 <= i < len(value) else UNDEFINED
    if isinstance(value, dict):
        return value.get(str(i), UNDEFINED)
    return UNDEFINED


# --------------------------------------------------------------------------
# selector-expression matchers — port of compiler.js:54-112 (convertMatcher)
# --------------------------------------------------------------------------

_ATTR_RE = re.compile(r"(\[(\^?\w+)(=\w+)?\])")
_MOD_RE = re.compile(r":([-\w]+)$")


def _parse_value(s: str | None):
    if s is None:
        return None
    try:
        f = float(s)
        return f
    except ValueError:
        pass
    if s == "true":
        return True
    if s == "false":
        return False
    return s


def _js_strict_eq(a, b) -> bool:
    """``===`` for the schema-attr vs matcher-value compare (bools are not 1)."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a is b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    return type(a) is type(b) and a == b


def convert_matcher(expr: str) -> Callable[[dict, str | None], bool] | None:
    """Parse ``[attr]``/``[^attr]``/``[attr=value]`` conjunctions + ``:modifier``.

    Returns ``match(schema, att) -> bool`` or None when *expr* is not a
    matcher key (plain method names are helpers, not selectors).
    """
    if ":" not in expr and "[" not in expr:
        return None
    mod = None
    m = _MOD_RE.search(expr)
    if m:
        mod = m.group(1)
    props = []
    for _, name, val in _ATTR_RE.findall(expr):
        neg = name.startswith("^")
        props.append(
            (name[1:] if neg else name, neg, _parse_value(val[1:] if val else None))
        )

    def match(schema: dict, att: str | None) -> bool:
        if att != mod:
            return False
        for name, neg, value in props:
            sv = schema.get(name, UNDEFINED)
            if neg:
                ok = sv is UNDEFINED or (
                    value is not None and not _js_strict_eq(sv, value)
                )
            else:
                ok = sv is not UNDEFINED and (
                    value is None or _js_strict_eq(sv, value)
                )
            if not ok:
                return False
        return True

    return match


# --------------------------------------------------------------------------
# $ref resolution — port of compiler.js:10-34
# --------------------------------------------------------------------------


def _detilde(s: str) -> str:
    return s.replace("~0", "~").replace("~1", "/")


def resolve_ref(loader, schema_root, ref: str):
    from urllib.parse import unquote

    rem, _, loc = unquote(ref).partition("#")
    node = schema_root
    if rem:
        if loader is None:
            raise ValueError("Remote refs are not supported for now :(")
        node = loader(rem)
    for part in loc.split("/"):
        if part == "":
            continue
        part = _detilde(part)
        if isinstance(node, list):
            node = node[int(part)]
        else:
            node = node.get(part) if isinstance(node, dict) else None
        if node is None:
            raise ValueError(f"Cannot find ref '{ref}' in schema")
    return node


# --------------------------------------------------------------------------
# compile-time context handed to selector handlers
# --------------------------------------------------------------------------


class CompileCtx:
    """What a selector handler sees at compile time: the schema path, the
    parent schema, and a ``compile`` hook for sub-walkers (combinators,
    dependencies) — the analog of compiler.js ``prepareContext``."""

    def __init__(self, compiler: "Compiler"):
        self._compiler = compiler
        self.path: list = []
        self.parent: dict | None = None

    def compile(self, subschema):
        """Compile an independent sub-walker sharing selector factory+options."""
        return self._compiler._subcompile(subschema)


# --------------------------------------------------------------------------
# the compiler — port of compiler.js step/stepProcess + processor.js
# --------------------------------------------------------------------------

_NodeFn = Callable[[Any, Context], None]


class Compiler:
    def __init__(self, schema_root, selector_factory, options=None, path=None):
        if not callable(selector_factory):
            raise TypeError("selector_factory shall be callable")
        self.schema_root = schema_root
        self.options = dict(options or {})
        self.selector = selector_factory()
        self.selector_factory = selector_factory
        self._init_path = list(path) if path else []
        self.cctx = CompileCtx(self)
        self._visiting: set[int] = set()
        self._root_cell: list = [None]
        # matchers in selector-key declaration order (prepareMatchers analog)
        self._matchers: list[tuple[str, Callable, Callable]] = []
        for expr, handler in self.selector.selectors().items():
            m = convert_matcher(expr)
            if m is not None:
                self._matchers.append((expr, m, handler))

    def _subcompile(self, subschema):
        return Compiler(
            subschema, self.selector_factory, self.options
        ).compile()

    # -- one schema node -> runtime closure --------------------------------

    def step(self, schema: dict, attr: str | None = None) -> _NodeFn:
        sid = id(schema)
        if sid in self._visiting:
            # recursion guard (compiler.js:236-242): re-entry restarts the
            # ROOT walker at the current path.  Deviation: errors collected
            # so far are preserved (reference resets them via begin()).
            root_cell = self._root_cell

            def recurse(value, rctx: Context):
                if value is UNDEFINED:
                    return
                sub = Context(rctx.path)
                sub.self_ = value
                sub.parent, sub.property = rctx.parent, rctx.property
                root_cell[0](value, sub)

            return recurse

        if isinstance(schema, dict) and "$ref" in schema:
            resolved = resolve_ref(
                self.options.get("loader"), self.schema_root, schema["$ref"]
            )
            self._visiting.add(sid)
            try:
                return self.step(resolved, attr)
            finally:
                self._visiting.discard(sid)

        self._visiting.add(sid)
        try:
            return self._step_process(schema, attr)
        finally:
            self._visiting.discard(sid)

    def _phase(self, schema: dict, att: str | None) -> list[_NodeFn] | None:
        """Compile all selectors matching (schema, att) — one labeled block."""
        fns = []
        for _, match, handler in self._matchers:
            if match(schema, att):
                rt = handler(schema, self.cctx)
                if rt is not None:
                    fns.append(rt)
        return fns or None

    def _step_process(self, schema: dict, attr: str | None) -> _NodeFn:
        # combinators subcompile first (processAggregate, compiler.js:275-281)
        aggregates = {}
        for name in ("oneOf", "anyOf", "allOf", "not"):
            if name in schema:
                sub = schema[name]
                aggregates[name] = (
                    [self._subcompile(s) for s in sub]
                    if isinstance(sub, list)
                    else self._subcompile(sub)
                )
        self.cctx.aggregates = aggregates

        phases: list[list[_NodeFn]] = []
        for att in ([attr] if attr else []) + ["start", None]:
            p = self._phase(schema, att)
            if p:
                phases.append(p)

        tail: list[list[_NodeFn]] = []
        for att in ["end"] + ([attr + "-end"] if attr else []):
            p = self._phase(schema, att)
            if p:
                tail.append(p)

        children: list[_NodeFn] = []
        prev_parent = self.cctx.parent
        self.cctx.parent = schema
        try:
            c = self._compile_items(schema)
            if c:
                children.append(c)
            c = self._compile_properties(schema)
            if c:
                children.append(c)
        finally:
            self.cctx.parent = prev_parent

        def run(value, rctx: Context):
            for phase in phases:
                for fn in phase:
                    fn(value, rctx)
                    if rctx.is_stopped():
                        break
            for child in children:
                child(value, rctx)
            for phase in tail:
                for fn in phase:
                    fn(value, rctx)
                    if rctx.is_stopped():
                        break

        return run

    # -- children: arrays (processor.js:31-64) ------------------------------

    def _compile_items(self, schema: dict) -> _NodeFn | None:
        items = schema.get("items")
        additional = schema.get("additionalItems")
        if items is None and additional is None:
            return None
        if not isinstance(items, list):
            item_schema = items if isinstance(items, dict) else {}
            self.cctx.path.append("[]")
            node = self.step(item_schema, attr="item")
            self.cctx.path.pop()
            ignore_ghost = self.options.get("ignoreSchemaOnly", False)

            def run_homogeneous(value, rctx: Context):
                # JS array-LIKE iteration, not isinstance(list): the
                # generated loop reads `val ? val.length : 0` and `val[i]`
                # (processor.js:38-40), so strings walk per character and
                # objects with a numeric `length` walk via "i" property
                # lookups.  Found by differential fuzz vs the reference.
                n = _js_array_like_length(value) if js_truthy(value) else 0
                for i in range(n):
                    elem = _js_index(value, i)
                    rctx.push(i, value, elem)
                    node(elem, rctx)
                    rctx.pop()
                if rctx.schema_only and not ignore_ghost:
                    # ghost walk: iterate the schema once with no data
                    # (processor.js:43-47) so pure-iterator selectors fire
                    rctx.push("[]", value, UNDEFINED)
                    node(UNDEFINED, rctx)
                    rctx.pop()

            return run_homogeneous

        # tuple form + additionalItems tail (processor.js:48-61)
        tuple_nodes = []
        for k, sub in enumerate(items):
            self.cctx.path.append(k)
            tuple_nodes.append(self.step(sub))
            self.cctx.path.pop()
        tail_node = None
        if not self.options.get("ignoreAdditionalItems", False):
            tail_node = self._compile_additional(schema, "additionalItems", "additionalItem")
        n_tuple = len(items)

        def run_tuple(value, rctx: Context):
            # positional reads are `val ? val[k] : undefined`
            # (processor.js:51) — JS property semantics, see run_homogeneous
            truthy = js_truthy(value)
            for k, node in enumerate(tuple_nodes):
                elem = _js_index(value, k) if truthy else UNDEFINED
                rctx.push(k, value, elem)
                node(elem, rctx)
                rctx.pop()
            if tail_node is not None and truthy:
                for i in range(n_tuple, _js_array_like_length(value)):
                    elem = _js_index(value, i)
                    rctx.push(i, value, elem)
                    tail_node(elem, rctx)
                    rctx.pop()

        return run_tuple

    # -- children: objects (processor.js:66-110) ----------------------------

    def _compile_properties(self, schema: dict) -> _NodeFn | None:
        props = schema.get("properties")
        has_any = (
            props is not None
            or schema.get("additionalProperties") is not None
            or schema.get("patternProperties") is not None
        )
        if not has_any:
            return None
        declared_nodes: list[tuple[str, _NodeFn]] = []
        for k, sub in (props or {}).items():
            self.cctx.path.append(k)
            declared_nodes.append((k, self.step(sub)))
            self.cctx.path.pop()
        declared = {k for k, _ in declared_nodes}

        extra_walk = None
        if not self.options.get("ignoreAdditionalItems", False):
            pattern_nodes: list[tuple[re.Pattern, _NodeFn]] = []
            for p, sub in (schema.get("patternProperties") or {}).items():
                self.cctx.path.append(p)
                pattern_nodes.append((re.compile(p), self.step(sub)))
                self.cctx.path.pop()
            additional_node = self._compile_additional(
                schema, "additionalProperties", "additionalProperty"
            )

            def extra_walk(value, rctx: Context):
                if not isinstance(value, dict):
                    return
                for key in list(value.keys()):
                    if key not in value:  # removed by a normalizer mid-walk
                        continue
                    pv = value[key]
                    seen = key in declared
                    for rx, node in pattern_nodes:
                        if rx.search(str(key)):
                            rctx.push(key, value, pv)
                            node(pv, rctx)
                            rctx.pop()
                            seen = True
                    if not seen:
                        rctx.push(key, value, pv)
                        additional_node(pv, rctx)
                        rctx.pop()

        def run_properties(value, rctx: Context):
            use = value if isinstance(value, dict) else None
            for k, node in declared_nodes:
                elem = use.get(k, UNDEFINED) if use is not None else UNDEFINED
                rctx.push(k, value, elem)
                node(elem, rctx)
                rctx.pop()
            if extra_walk is not None:
                extra_walk(value, rctx)

        return run_properties

    def _compile_additional(self, schema, schema_prop, cb_prop) -> _NodeFn:
        """Stub-schema dispatch (processor.js:112-123): synthesize
        ``{additionalItem: false}`` / ``{additionalProperty: "allowed"}`` so
        selectors like ``[additionalProperty=false]`` fire per extra member."""
        spec = schema.get(schema_prop)
        if spec is False:
            return self.step({cb_prop: False})
        if isinstance(spec, dict):
            return self.step(spec)
        return self.step({cb_prop: "allowed"})

    # -- final assembly (compiler.js:283-311) --------------------------------

    def compile(self):
        root = self.step(self.schema_root)
        self._root_cell[0] = root
        selector = self.selector
        init_path = self._init_path

        def fn(value=UNDEFINED, path=None):
            rctx = Context(path if path is not None else init_path)
            rctx.schema_only = value is UNDEFINED
            begin = getattr(selector, "begin", None)
            if begin:
                begin()
            rctx.reset(rctx.path, value)
            root(value, rctx)
            end = getattr(selector, "end", None)
            return end(value) if end else None

        fn.selector = selector
        return fn


# --------------------------------------------------------------------------
# V4 validator selector — port of /root/reference/src/v4validator.js
# --------------------------------------------------------------------------


class V4Validator:
    """Draft-4 validator selector: every keyword check appends an ordered
    error record ``{code, message, value, arg, path}``; evaluation continues
    (only the optional-undefined skip stops a subtree)."""

    def __init__(self, options: dict | None = None):
        self.options = dict(options or {})
        self.gettext = self.options.get("gettext") or (lambda s: s)
        self.messages = self.options.get("messages") or default_messages(self.gettext)
        self.custom = self.options.get("custom") or {}
        self.formats = fill_default_formats(self.options.get("formats"))
        self.errors: list[dict] = []
        self._cm = None
        self._cm_set = False

    # -- result protocol ----------------------------------------------------

    def begin(self):
        self.errors = []
        self._cm, self._cm_set = None, False

    def end(self, _value):
        return {"valid": not self.errors, "errors": self.errors}

    def error(self, code: str, rctx: Context, arg=None):
        # message resolution incl. the one-shot $cm quirk (v4validator.js:57-59)
        if self._cm_set:
            msg = self.gettext((self._cm or {}).get(code))
            self._cm, self._cm_set = None, False
        else:
            msg = self.messages.get(code)
            if msg is None:
                msg = arg
            if msg is None:
                raise ValueError(f"There is no message registered for error '{code}'")
        self.errors.append(
            {
                "code": code,
                "message": msg,
                "value": rctx.self_,
                "arg": arg,
                "path": list(rctx.path),
            }
        )

    def copy_errors(self, other: list[dict]):
        self.errors.extend(other)

    # -- extension API (reference README.md:229-261, Validator.extend) ------

    @classmethod
    def extend(cls, extra_selectors: dict):
        """Subclass with additional selector expressions — the analog of the
        reference's ``s.Validator.extend({'[notEqualTo]': fn, ...})``.

        Each value is a compile-style handler ``fn(validator, schema, cctx)
        -> runtime(value, rctx) | None`` (the walker's handler protocol with
        the validator instance passed explicitly in place of JS ``this`` —
        call ``validator.error(code, rctx, arg)`` to report).  Extensions
        are appended after the built-in selectors, so they fire last within
        a node, like prototype-extended keys in the reference.  Use
        ``Extended.factory(options)`` with ``new_iterator`` or pass the
        class to ``new_validator(..., validator_cls=...)``."""

        class Extended(cls):
            def selectors(self):
                base = super().selectors()
                for expr, h in extra_selectors.items():
                    def compile_handler(schema, cctx, _h=h):
                        return _h(self, schema, cctx)

                    base[expr] = compile_handler
                return base

        Extended.__name__ = f"{cls.__name__}Extended"
        return Extended

    @classmethod
    def factory(cls, options: dict | None = None):
        """Selector factory closing over options (v4validator.js:391-416)."""
        return lambda: cls(options)

    # -- selector registry (prototype key order = error firing order) -------

    def selectors(self):
        return {
            "[messages]": self._sel_messages,
            "[^required]": self._sel_optional_skip,
            "[type=string]": self._type_check("string", lambda v: isinstance(v, str)),
            "[type=number]": self._type_check("number", lambda v: js_typeof(v) == "number"),
            "[type=integer]": self._type_check(
                "integer", lambda v: js_typeof(v) == "number" and v % 1 == 0
            ),
            "[type=null]": self._type_check("null", lambda v: v is None),
            "[type=boolean]": self._type_check("boolean", lambda v: isinstance(v, bool)),
            "[type=array]": self._type_check("array", lambda v: isinstance(v, list)),
            "[type=object]": self._type_check("object", is_js_object),
            "[type]": self._sel_type_union,
            "[dependencies]": self._sel_dependencies,
            "[allOf]": self._sel_all_of,
            "[anyOf]": self._sel_any_of,
            "[oneOf]": self._sel_one_of,
            "[not]": self._sel_not,
            "[enum]": self._sel_enum,
            "[maxLength]": self._sel_max_length,
            "[minLength]": self._sel_min_length,
            "[pattern]": self._sel_pattern,
            "[format]": self._sel_format,
            "[additionalItem=false]": self._sel_additional_item,
            "[minItems]": self._sel_min_items,
            "[maxItems]": self._sel_max_items,
            "[uniqueItems]": self._sel_unique_items,
            "[required][^properties]": self._sel_required_bare,
            "[properties]": self._sel_required_merged,
            "[maxProperties]": self._sel_max_properties,
            "[minProperties]": self._sel_min_properties,
            "[additionalProperty=false]": self._sel_additional_property,
            "[multipleOf]": self._sel_multiple_of,
            "[minimum]": self._sel_minimum,
            "[maximum]": self._sel_maximum,
            "[conform]": self._sel_conform,
        }

    # -- handlers: each is handler(schema, cctx) -> runtime(value, rctx) ----

    def _sel_messages(self, schema, cctx):
        table = schema["messages"]

        def run(value, rctx):
            self._cm, self._cm_set = table, True

        return run

    def _sel_optional_skip(self, schema, cctx):
        # only for non-root nodes (prepare checks compile ctx.parent,
        # v4validator.js:81-86): undefined value -> skip subtree checks
        if cctx.parent is None:
            return None

        def run(value, rctx):
            if value is UNDEFINED:
                rctx.stop()

        return run

    def _type_check(self, code, pred):
        def handler(schema, cctx):
            def run(value, rctx):
                if not pred(value):
                    self.error(code, rctx)

            return run

        return handler

    def _sel_type_union(self, schema, cctx):
        # union type: emit all branch errors only if every branch failed
        # (v4validator.js:122-143)
        types = schema["type"]
        if not isinstance(types, list):
            return None
        regs = self.selectors()
        branch_handlers = [regs[f"[type={t}]"]({"type": t}, cctx) for t in types]

        def run(value, rctx):
            old = self.errors
            new: list[dict] = []
            self.errors = new
            for b in branch_handlers:
                b(value, rctx)
            self.errors = old
            if len(new) == len(branch_handlers):
                self.copy_errors(new)

        return run

    def _sel_dependencies(self, schema, cctx):
        deps = []
        for prop, dep in schema["dependencies"].items():
            spec = {"required": dep} if isinstance(dep, list) else dep
            deps.append((prop, cctx.compile(spec), dep))

        def run(value, rctx):
            if not isinstance(value, dict):
                return
            for prop, sub, orig in deps:
                if prop in value:
                    res = sub(value)  # note: no path (reference passes none)
                    if not res["valid"]:
                        self.error("dependency", rctx, orig)
                        self.copy_errors(res["errors"])

        return run

    def _sel_all_of(self, schema, cctx):
        subs = cctx.aggregates["allOf"]

        def run(value, rctx):
            for sub in subs:
                res = sub(value, rctx.path)
                if not res["valid"]:
                    self.error("allOf", rctx)
                    self.copy_errors(res["errors"])

        return run

    def _sel_any_of(self, schema, cctx):
        subs = cctx.aggregates["anyOf"]

        def run(value, rctx):
            collected: list[dict] = []
            res = None
            for sub in subs:
                res = sub(value, rctx.path)
                collected.extend(res["errors"])
                if res["valid"]:
                    break
            if res is not None and not res["valid"]:
                self.error("anyOf", rctx)
                self.copy_errors(collected)

        return run

    def _sel_one_of(self, schema, cctx):
        subs = cctx.aggregates["oneOf"]

        def run(value, rctx):
            count = 0
            collected: list[dict] = []
            for sub in subs:
                res = sub(value, rctx.path)
                collected.extend(res["errors"])
                if res["valid"]:
                    count += 1
            if count == 0:
                self.error("oneOf.zero", rctx)
                self.copy_errors(collected)
            elif count != 1:
                self.error("oneOf", rctx)

        return run

    def _sel_not(self, schema, cctx):
        sub = cctx.aggregates["not"]

        def run(value, rctx):
            if sub(value, rctx.path)["valid"]:
                self.error("not", rctx)

        return run

    def _sel_enum(self, schema, cctx):
        # precompiled hash-set keyed by toComparable — structural,
        # key-order-sensitive equality (v4validator.js:223-232)
        values = schema["enum"]
        keys = {js_property_key(to_comparable(e)) for e in values}

        def run(value, rctx):
            if js_property_key(to_comparable(value)) not in keys:
                self.error("enum", rctx, values)

        return run

    def _x_length(self, schema, bound, op, code):
        def run(value, rctx):
            if isinstance(value, str) and op(js_string_length(value), bound):
                self.error(code, rctx, bound)

        return run

    def _sel_max_length(self, schema, cctx):
        return self._x_length(schema, schema["maxLength"], lambda a, b: a > b, "maxLength")

    def _sel_min_length(self, schema, cctx):
        return self._x_length(schema, schema["minLength"], lambda a, b: a < b, "minLength")

    def _sel_pattern(self, schema, cctx):
        pat = schema["pattern"]
        rx = re.compile(pat)  # unanchored search, like JS String#match

        def run(value, rctx):
            if isinstance(value, str) and not rx.search(value):
                self.error("pattern", rctx, pat)

        return run

    def _sel_format(self, schema, cctx):
        name = schema["format"]
        fmt = self.formats.get(name)
        if fmt is None:
            raise ValueError(
                f"Unknown format '{name}'. Did you forget to register it?"
            )
        rx, msg = fmt["regexp"], fmt["message"]
        code = f"format.{name}"

        def run(value, rctx):
            if isinstance(value, str) and not rx.search(value):
                self.error(code, rctx, msg)

        return run

    def _sel_additional_item(self, schema, cctx):
        def run(value, rctx):
            self.error("additionalItems", rctx)

        return run

    def _x_items(self, bound, op, code):
        def run(value, rctx):
            if isinstance(value, list) and op(len(value), bound):
                self.error(code, rctx)

        return run

    def _sel_min_items(self, schema, cctx):
        return self._x_items(schema["minItems"], lambda a, b: a < b, "minItems")

    def _sel_max_items(self, schema, cctx):
        return self._x_items(schema["maxItems"], lambda a, b: a > b, "maxItems")

    def _sel_unique_items(self, schema, cctx):
        # one error per duplicate *occurrence*, carrying the duplicated value
        # (v4validator.js:277-290); fires on attr presence even if false,
        # like the reference matcher
        def run(value, rctx):
            if not isinstance(value, list):
                return
            seen = set()
            for item in value:
                key = js_property_key(to_comparable(item))
                if key in seen:
                    self.error("uniqueItems", rctx, item)
                seen.add(key)

        return run

    def _process_required(self, reqs):
        if not isinstance(reqs, list):
            return None

        def run(value, rctx):
            if not is_js_object(value):
                return
            for r in reqs:
                if r not in value:
                    self.error("required", rctx)

        return run

    def _sel_required_bare(self, schema, cctx):
        return self._process_required(schema["required"])

    def _sel_required_merged(self, schema, cctx):
        # v4 array form + v3 per-property `required: true` (v4validator.js:315-321)
        props = schema["properties"]
        base = schema.get("required")
        base = base if isinstance(base, list) else []
        reqs = base + [
            k
            for k, s in props.items()
            if isinstance(s, dict) and s.get("required") is True
        ]
        return self._process_required(reqs)

    def _x_properties(self, bound, op, code):
        def run(value, rctx):
            if value is None or value is UNDEFINED:
                return  # reference crashes on Object.keys(null); we skip
            if js_typeof(value) == "object" and op(len(value), bound):
                self.error(code, rctx, bound)

        return run

    def _sel_max_properties(self, schema, cctx):
        return self._x_properties(schema["maxProperties"], lambda a, b: a > b, "maxProperties")

    def _sel_min_properties(self, schema, cctx):
        return self._x_properties(schema["minProperties"], lambda a, b: a < b, "minProperties")

    def _sel_additional_property(self, schema, cctx):
        def run(value, rctx):
            self.error("additionalProperties", rctx)

        return run

    def _sel_multiple_of(self, schema, cctx):
        k = schema["multipleOf"]

        def run(value, rctx):
            if js_typeof(value) != "number":
                return
            if k == 0 or (value / k) % 1 != 0:
                self.error("multipleOf", rctx, k)

        return run

    def _sel_minimum(self, schema, cctx):
        bound = schema["minimum"]
        if schema.get("exclusiveMinimum"):
            def run(value, rctx):
                if js_le(value, bound):
                    self.error("minimum.exclusive", rctx, bound)
        else:
            def run(value, rctx):
                if js_lt(value, bound):
                    self.error("minimum", rctx, bound)

        return run

    def _sel_maximum(self, schema, cctx):
        bound = schema["maximum"]
        if schema.get("exclusiveMaximum"):
            def run(value, rctx):
                if js_ge(value, bound):
                    self.error("maximum.exclusive", rctx, bound)
        else:
            def run(value, rctx):
                if js_gt(value, bound):
                    self.error("maximum", rctx, bound)

        return run

    def _sel_conform(self, schema, cctx):
        conform = schema["conform"]
        if callable(conform):
            def run(value, rctx):
                if not js_truthy(conform(value, rctx)):
                    self.error("custom", rctx)

            return run

        checks = []
        for name, spec in conform.items():
            fn = self.custom[name]
            args = [] if spec is True else list(spec)
            checks.append((name, fn, args))

        def run(value, rctx):
            for name, fn, args in checks:
                if not js_truthy(fn(value, *args, rctx)):
                    self.error(f"custom.{name}", rctx, self.messages.get("custom"))

        return run


# --------------------------------------------------------------------------
# normalizer selector — port of /root/reference/src/normalizer.js
# --------------------------------------------------------------------------


class Normalizer:
    """ELT-style transforms: defaults, undeclared-property removal, type
    coercions.  Mutates containers in place via ctx.replace/remove; a node's
    own value binding is *not* refreshed after replace (reference semantics:
    defaults are not subsequently coerced)."""

    def selectors(self):
        return {
            "[default]": self._sel_default,
            "[additionalProperty]": self._sel_additional_property,
            "[type]": self._sel_type,
        }

    def end(self, value):
        return value

    def _sel_default(self, schema, cctx):
        dflt = schema["default"]

        def run(value, rctx):
            if value is None or value is UNDEFINED:
                rctx.replace(dflt)

        return run

    def _sel_additional_property(self, schema, cctx):
        def run(value, rctx):
            rctx.remove()

        return run

    def _sel_type(self, schema, cctx):
        t = schema["type"]
        if not isinstance(t, str):
            return None

        def run(value, rctx):
            if value is None or value is UNDEFINED:
                return
            if t == "null":
                rctx.replace(None)
            elif t == "string":
                rctx.replace(js_to_string(value))
            elif t == "integer":
                rctx.replace(js_parse_int(value))
            elif t == "number":
                rctx.replace(js_parse_float(value))
            elif t == "boolean":
                sval = value.lower() if isinstance(value, str) else None
                if sval in ("true", "on"):
                    rctx.replace(True)
                elif sval in ("false", "off"):
                    rctx.replace(False)
                else:
                    rctx.replace(js_truthy(value))
            elif t == "array":
                if not isinstance(value, list):
                    rctx.replace([value])
            # object: no-op

        return run


# --------------------------------------------------------------------------
# public entry points — port of /root/reference/src/iterator.js:7-20
# --------------------------------------------------------------------------


def new_iterator(schema, selector_factory, options=None, path=None):
    return Compiler(schema, selector_factory, options, path).compile()


def new_validator(schema, options=None, validator_cls=None):
    """Compile a validator.  ``validator_cls`` lets callers pass a
    ``V4Validator.extend({...})`` subclass (reference README.md:229-261)."""
    opts = dict(options or {})
    cls = validator_cls or V4Validator
    return Compiler(schema, cls.factory(opts), opts).compile()


def new_normalizer(schema, options=None):
    return Compiler(schema, Normalizer, options).compile()
