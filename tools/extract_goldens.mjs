// Extract expected GeoJSON golden objects from the reference vitest suite.
// The goldens are pure object literals; we slice each `const expectedGeojson = {...};`
// block by brace counting and eval it. Data extraction only — no reference code is reused.
import { readFileSync, writeFileSync } from 'node:fs';

const src = readFileSync('/root/reference/tests/convertAirspaces.test.ts', 'utf-8');
const names = [
  'with-service', 'single-arc-clockwise', 'single-arc-counterclockwise',
  'circle', 'single-line', 'multi-sequence', 'pill-shaped',
];
let idx = 0, out = {};
let pos = 0, n = 0;
while (true) {
  const m = src.indexOf('const expectedGeojson =', pos);
  if (m === -1) break;
  const start = src.indexOf('{', m);
  let depth = 0, end = start;
  for (let i = start; i < src.length; i++) {
    const c = src[i];
    if (c === '{') depth++;
    else if (c === '}') { depth--; if (depth === 0) { end = i + 1; break; } }
  }
  const literal = src.slice(start, end);
  const obj = eval('(' + literal + ')');
  out[names[n]] = obj;
  writeFileSync(`/root/repo/tests/goldens/${names[n]}.json`, JSON.stringify(obj));
  n++; pos = end;
}
console.log('extracted', n, 'goldens');
// also capture per-test converter configs
const configs = [...src.matchAll(/new YaixmConverter\((\{[^)]*\})\)/gs)].map(m => m[1].replace(/\s+/g,' '));
writeFileSync('/root/repo/tests/goldens/_configs.txt', configs.join('\n'));
console.log(configs.join('\n'));
