#!/usr/bin/env node
/**
 * Extract the reference's jest fixture DATA (real npm registry documents)
 * into JSON files under tests/fixtures/. This copies test *data* (public
 * registry documents), not engine code, so our PySpark engine can be
 * golden-tested against the same corpus the reference tests itself with
 * (reference: src/__tests__/rawPackages.ts, preact-simplified.ts).
 */
const fs = require('fs');
const path = require('path');
const vm = require('vm');

const REF = '/root/reference/src/__tests__';
const OUT = path.join(__dirname, '..', 'tests', 'fixtures');

function loadTsFixture(file, constName) {
  let src = fs.readFileSync(path.join(REF, file), 'utf8');
  // strip the import line and type annotations on the const
  src = src.replace(/^import[^;]+;$/m, '');
  src = src.replace(
    new RegExp(`const ${constName}:[^=]+=`),
    `globalThis.__out =`
  );
  src = src.replace(/^export default .*$/m, '');
  const ctx = { globalThis: {} };
  vm.createContext(ctx);
  vm.runInContext(src, ctx);
  return ctx.globalThis.__out;
}

fs.mkdirSync(OUT, { recursive: true });
const raws = loadTsFixture('rawPackages.ts', 'rawPackages');
fs.writeFileSync(path.join(OUT, 'raw_packages.json'), JSON.stringify(raws, null, 1));
const preact = loadTsFixture('preact-simplified.ts', 'preact');
fs.writeFileSync(path.join(OUT, 'preact.json'), JSON.stringify(preact, null, 1));
console.log(`wrote ${raws.length} raw packages + preact`);
