#!/usr/bin/env python3
"""Extract the reference's jest golden snapshots into JSON test fixtures.

The .snap file is a JS module of `exports[name] = \`<pretty-format>\``
entries. We eval the template literals with node, then parse jest's
pretty-format syntax (Object { } / Array [ ] / bare literals) here.
Special tokens are preserved with a "__JEST__:" prefix so the pytest
comparators can treat them as wildcards (Any<...>) or JS-isms (NaN,
undefined). This extracts test *data* from the public reference repo —
golden parity targets per SURVEY.md §5 — not engine code.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

SNAP = "/root/reference/src/__tests__/__snapshots__/formatPkg.test.ts.snap"
OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures"

NODE_DUMP = r"""
const fs = require('fs');
const vm = require('vm');
const src = fs.readFileSync(process.argv[1], 'utf8');
const ctx = { exports: {} };
vm.createContext(ctx);
vm.runInContext(src, ctx);
process.stdout.write(JSON.stringify(ctx.exports));
"""


class Parser:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def ws(self):
        while self.i < len(self.s) and self.s[self.i] in " \n\t\r":
            self.i += 1

    def parse(self):
        self.ws()
        return self.value()

    def value(self):
        s, i = self.s, self.i
        c = s[i]
        if c == '"':
            return self.string()
        if c == "{":
            return self.obj()
        if c == "[":
            return self.arr()
        # identifier-prefixed object/array: `Package {`, `Object {`, `Array [`
        j = i
        while j < len(s) and (s[j].isalnum() or s[j] in "_$<>."):
            j += 1
        word = s[i:j]
        k = j
        while k < len(s) and s[k] == " ":
            k += 1
        if k < len(s) and s[k] == "{":
            self.i = k
            return self.obj()
        if k < len(s) and s[k] == "[":
            self.i = k
            return self.arr()
        # bare literal
        self.i = j
        if word == "true":
            return True
        if word == "false":
            return False
        if word == "null":
            return None
        if word in ("undefined", "NaN", "Infinity") or word.startswith("Any<"):
            return f"__JEST__:{word}"
        # number (may include - . e)
        j = i
        while j < len(s) and (s[j].isdigit() or s[j] in "-+.eE"):
            j += 1
        self.i = j
        tok = s[i:j]
        try:
            return int(tok)
        except ValueError:
            return float(tok)

    def string(self):
        s = self.s
        assert s[self.i] == '"'
        self.i += 1
        out = []
        while True:
            c = s[self.i]
            if c == "\\":
                nxt = s[self.i + 1]
                out.append({"n": "\n", "t": "\t", "r": "\r"}.get(nxt, nxt))
                self.i += 2
            elif c == '"':
                self.i += 1
                return "".join(out)
            else:
                out.append(c)
                self.i += 1

    def obj(self):
        assert self.s[self.i] == "{"
        self.i += 1
        out = {}
        while True:
            self.ws()
            if self.s[self.i] == "}":
                self.i += 1
                return out
            key = self.string()
            self.ws()
            assert self.s[self.i] == ":", self.s[self.i : self.i + 40]
            self.i += 1
            self.ws()
            out[key] = self.value()
            self.ws()
            if self.s[self.i] == ",":
                self.i += 1

    def arr(self):
        assert self.s[self.i] == "["
        self.i += 1
        out = []
        while True:
            self.ws()
            if self.s[self.i] == "]":
                self.i += 1
                return out
            out.append(self.value())
            self.ws()
            if self.s[self.i] == ",":
                self.i += 1


def main():
    raw = subprocess.run(
        ["node", "-e", NODE_DUMP, SNAP], capture_output=True, text=True, check=True
    ).stdout
    entries = json.loads(raw)
    parsed = {name: Parser(body).parse() for name, body in entries.items()}
    OUT.mkdir(parents=True, exist_ok=True)
    with open(OUT / "format_pkg_golden.json", "w") as f:
        json.dump(parsed, f, indent=1)
    print(f"wrote {len(parsed)} golden snapshots to {OUT}/format_pkg_golden.json")
    for k in parsed:
        print(" -", k)


if __name__ == "__main__":
    sys.exit(main())
