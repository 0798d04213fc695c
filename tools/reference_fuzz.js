// Differential-fuzz harness: run (schema, instances) groups through the
// reference's validator AND normalizer, print full results as one JSON
// line.  Input file: [{schema, instances: [...]}] — output:
// [{errors: [[{code, path}, ...] per instance], normalized: [...]}].
// The normalizer compile gets a deep-copied schema: the reference leaks
// $$visited on $ref-holding nodes, so a second compile of the same object
// would miscompile (see tools/corpus_vs_reference.js).
"use strict";
var fs = require("fs");
var ref = require("/root/reference/src/iterator.js");

var groups = JSON.parse(fs.readFileSync(process.argv[2], "utf8"));
var out = groups.map(function (g) {
    var validator = ref.newValidator(g.schema);
    var normalizer = ref.newNormalizer(JSON.parse(JSON.stringify(g.schema)));
    var errors = [], normalized = [];
    g.instances.forEach(function (inst) {
        // the normalizer mutates in place — validate a private copy first
        var res = validator(JSON.parse(JSON.stringify(inst)));
        errors.push(res.errors.map(function (e) {
            return {code: e.code, path: e.path.map(String)};
        }));
        // the reference normalizer THROWS on some inputs (boolean coercion
        // of any non-string calls object.toLowerCase(); root-level replace
        // writes through a null parent) — report the crash instead of
        // aborting the whole batch, so the comparison layer can assert the
        // documented deviation rather than silently skipping the group
        try {
            normalized.push(normalizer(JSON.parse(JSON.stringify(inst))));
        } catch (e) {
            normalized.push({"$crash": String(e)});
        }
    });
    return {errors: errors, normalized: normalized};
});
console.log(JSON.stringify(out));
