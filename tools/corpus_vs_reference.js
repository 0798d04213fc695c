// Run every (schema, test) pair of a draft4_corpus.json-shaped file through
// the actual reference implementation (/root/reference/src) and print one
// JSON line: [{group, test, expected, reference, error}].  Used to verify
// that the corpus' expected verdicts are the REFERENCE's verdicts (not the
// author's guesses) — see tests/test_draft4_corpus.py.
"use strict";
var fs = require("fs");
var ref = require("/root/reference/src/iterator.js");

var corpus = JSON.parse(fs.readFileSync(process.argv[2], "utf8"));
var out = [];
corpus.forEach(function (g) {
    // compile ONCE per group: the reference never deletes its $$visited
    // marker from nodes that hold a $ref (compiler.js step() returns early
    // on the deref path), so a second compile of the SAME schema object
    // miscompiles those refs as root-recursion self-calls.  The official
    // suite runner also compiles once per group, so once-per-group is the
    // behavior to match.
    var validator = null, compileErr = null;
    try {
        validator = ref.newValidator(g.schema);
    } catch (e) {
        compileErr = String(e);
    }
    g.tests.forEach(function (t) {
        var verdict = null, err = compileErr;
        try {
            if (validator) verdict = validator(t.data).valid;
        } catch (e) {
            err = String(e);
        }
        out.push({
            group: g.description,
            test: t.description,
            expected: t.valid,
            reference: verdict,
            error: err
        });
    });
});
console.log(JSON.stringify(out));
