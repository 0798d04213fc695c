"""Generic-iterator behavioral specs ported from
/root/reference/test/iterator_spec.js: selector matching, multi-level firing,
:start/:item event order, ctx.stop suppression, and path correctness.

Our selector protocol is compile-time handlers (``handler(schema, cctx) ->
runtime(value, rctx)``) — the Python port of the reference's
prepare/1-2-arg partial-evaluation forms.
"""

from schemasaurus_spark import new_iterator


class RecordingSelector:
    """Records which selector expressions fire, in order."""

    def __init__(self, exprs, stop_on=None):
        self.exprs = exprs
        self.stop_on = stop_on
        self.events = []

    def begin(self):
        self.events = []

    def end(self, value):
        return self.events

    def selectors(self):
        out = {}
        for expr in self.exprs:
            out[expr] = self._make(expr)
        return out

    def _make(self, expr):
        def handler(schema, cctx):
            def run(value, rctx):
                self.events.append((expr, value))
                if self.stop_on == expr:
                    rctx.stop()

            return run

        return handler


def run_iterator(schema, exprs, value, stop_on=None):
    sel = RecordingSelector(exprs, stop_on)
    it = new_iterator(schema, lambda: sel)
    return it(value)


def test_attribute_matching():  # iterator_spec.js:12-30, 92-109
    events = run_iterator({"a": 1, "b": 2}, ["[a]", "[a=1]", "[a=2]", "[^c]", "[^a]"], 7)
    fired = [e[0] for e in events]
    assert fired == ["[a]", "[a=1]", "[^c]"]


def test_negative_value_matching():
    events = run_iterator({"a": 3}, ["[^a=3]", "[^a=4]"], 7)
    fired = [e[0] for e in events]
    # [^a=3]: a present and equal -> no; [^a=4]: a present but != 4 -> yes
    assert fired == ["[^a=4]"]


def test_multi_level_firing():  # iterator_spec.js:32-49
    schema = {
        "m": 1,
        "properties": {"p1": {"m": 2}, "p2": {"m": 3}},
    }
    events = run_iterator(schema, ["[m]"], {"p1": "x", "p2": "y"})
    assert [e for e in events] == [("[m]", {"p1": "x", "p2": "y"}), ("[m]", "x"), ("[m]", "y")]


def test_event_order_items():  # iterator_spec.js:51-90 (golden sequence)
    schema = {"type": "array", "items": {"type": "string", "item": True}}
    sel = RecordingSelector([":start", ":item", "[item]", ":item-end", ":end"])
    it = new_iterator(schema, lambda: sel)
    events = it(["a", "b"])
    # :start of root, then per element :item -> [item] -> :item-end,
    # then :end of root  (plus the item node's own :start/:end)
    names = [e[0] for e in events]
    a_idx = [i for i, e in enumerate(events) if e == ("[item]", "a")]
    b_idx = [i for i, e in enumerate(events) if e == ("[item]", "b")]
    assert names[0] == ":start"
    assert names[-1] == ":end"
    assert len(a_idx) == 1 and len(b_idx) == 1 and a_idx[0] < b_idx[0]
    # :item fires before the element selectors, :item-end after
    assert names.index(":item") < a_idx[0]
    assert names[a_idx[0] + 1 : a_idx[0] + 2] != [":item"]


def test_stop_suppresses_rest_of_phase():  # iterator_spec.js:111-118
    events = run_iterator({"a": 1, "b": 2}, ["[a]", "[b]"], 7, stop_on="[a]")
    assert [e[0] for e in events] == ["[a]"]


def test_object_paths():  # iterator_spec.js:120-130
    paths = []

    class PathSel:
        def selectors(self):
            def handler(schema, cctx):
                def run(value, rctx):
                    paths.append(list(rctx.path))

                return run

            return {"[leaf]": handler}

        def end(self, value):
            return paths

    schema = {
        "properties": {
            "p1": {"properties": {"p2": {"leaf": True}}},
        }
    }
    it = new_iterator(schema, PathSel)
    assert it({"p1": {"p2": 1}}) == [["p1", "p2"]]


def test_array_paths():  # iterator_spec.js:132-142
    paths = []

    class PathSel:
        def selectors(self):
            def handler(schema, cctx):
                def run(value, rctx):
                    paths.append(list(rctx.path))

                return run

            return {"[leaf]": handler}

        def end(self, value):
            return paths

    schema = {"properties": {"p1": {"type": "array", "items": {"leaf": True}}}}
    it = new_iterator(schema, PathSel)
    assert it({"p1": ["x", "y"]}) == [["p1", 0], ["p1", 1]]


def test_compile_time_schema_path():  # iterator_spec.js:144-157
    seen = []

    class CompilePathSel:
        def selectors(self):
            def handler(schema, cctx):
                seen.append(list(cctx.path))
                return None

            return {"[leaf]": handler}

    schema = {
        "properties": {
            "q": {"properties": {"w": {"type": "array", "items": {"leaf": True}}}}
        }
    }
    new_iterator(schema, CompilePathSel)
    assert seen == [["q", "w", "[]"]]


def test_schema_only_ghost_walk():  # processor.js:43-47
    events = run_iterator(
        {"type": "array", "items": {"g": 1}}, ["[g]"], value=None
    )
    # value=None is a real value (null), no ghost walk...
    sel = RecordingSelector(["[g]"])
    it = new_iterator({"type": "array", "items": {"g": 1}}, lambda: sel)
    ghost = it()  # no-arg call = schema-only iteration
    assert [e[0] for e in ghost] == ["[g]"]
