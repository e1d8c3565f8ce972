#!/usr/bin/env node
/* Golden-parity oracle: runs the ACTUAL reference bundle
 * (/root/reference/dist/GeoConvert.js) under node with a minimal DOM shim
 * (DOMParser / XMLSerializer / document.implementation), so our Scala codecs
 * can be compared against the reference's real behavior.
 *
 * stdin:  JSON {op, input | inputs} per line... (single request per run)
 * stdout: JSON result
 * ops: kml2geojson, gpx2geojson, geojson2kml, geojson2gpx, wkt2geojson,
 *      xml2json, json2xml, shp2geojson (input: {shpB64, dbfB64, prj?})
 */


// ---------- minimal XML DOM ----------

class XNode {
  constructor(type) { this.nodeType = type; }
}

class XText extends XNode {
  constructor(data) { super(3); this.data = data; }
  get textContent() { return this.data; }
}

class XElement extends XNode {
  constructor(tagName) {
    super(1);
    this.tagName = tagName;
    this.attributes = [];
    this.childNodes = [];
  }
  get children() { return this.childNodes.filter(n => n.nodeType === 1); }
  get textContent() {
    return this.childNodes.map(n => n.textContent).join('');
  }
  set textContent(v) {
    // real DOM: setting textContent to '' removes all children (no text node)
    const str = v === undefined ? 'undefined' : String(v);
    this.childNodes = str === '' ? [] : [new XText(str)];
  }
  setAttribute(name, value) {
    const existing = this.attributes.find(a => a.nodeName === name);
    if (existing) existing.nodeValue = String(value);
    else this.attributes.push({ nodeName: name, nodeValue: String(value) });
  }
  appendChild(el) { this.childNodes.push(el); }
}

class XDocument extends XNode {
  constructor() { super(9); this.childNodes = []; this.attributes = null; this.xmlVersion = '1.0'; }
  get children() { return this.childNodes.filter(n => n.nodeType === 1); }
  get documentElement() { return this.children[0]; }
  get textContent() { return ''; }
  createElement(name) { return new XElement(name); }
}

function decodeEntities(s) {
  return s.replace(/&#x([0-9a-fA-F]+);/g, (_, h) => String.fromCodePoint(parseInt(h, 16)))
    .replace(/&#([0-9]+);/g, (_, d) => String.fromCodePoint(parseInt(d, 10)))
    .replace(/&lt;/g, '<').replace(/&gt;/g, '>')
    .replace(/&quot;/g, '"').replace(/&apos;/g, "'").replace(/&amp;/g, '&');
}

function parseXml(str) {
  const doc = new XDocument();
  let i = 0;
  const n = str.length;
  const stack = [doc];
  function top() { return stack[stack.length - 1]; }
  while (i < n) {
    if (str[i] === '<') {
      if (str.startsWith('<?', i)) { i = str.indexOf('?>', i) + 2; continue; }
      if (str.startsWith('<!--', i)) { i = str.indexOf('-->', i) + 3; continue; }
      if (str.startsWith('<![CDATA[', i)) {
        const end = str.indexOf(']]>', i);
        top().childNodes.push(new XText(str.slice(i + 9, end)));
        i = end + 3; continue;
      }
      if (str.startsWith('<!', i)) { i = str.indexOf('>', i) + 1; continue; }
      if (str.startsWith('</', i)) {
        i = str.indexOf('>', i) + 1;
        stack.pop(); continue;
      }
      // open tag
      let j = i + 1;
      while (j < n && !/[\s/>]/.test(str[j])) j++;
      const el = new XElement(str.slice(i + 1, j));
      // attributes
      while (j < n) {
        while (j < n && /\s/.test(str[j])) j++;
        if (str[j] === '>' || (str[j] === '/' && str[j + 1] === '>')) break;
        let k = j;
        while (k < n && !/[=\s/>]/.test(str[k])) k++;
        const name = str.slice(j, k);
        while (k < n && /\s/.test(str[k])) k++;
        if (str[k] === '=') {
          k++;
          while (k < n && /\s/.test(str[k])) k++;
          const q = str[k]; k++;
          const end = str.indexOf(q, k);
          el.setAttribute(name, decodeEntities(str.slice(k, end)));
          j = end + 1;
        } else {
          el.setAttribute(name, '');
          j = k;
        }
      }
      top().childNodes.push(el);
      if (str[j] === '/' && str[j + 1] === '>') { i = j + 2; }
      else { i = j + 1; stack.push(el); }
    } else {
      const end = str.indexOf('<', i);
      const text = str.slice(i, end === -1 ? n : end);
      if (text.length) top().childNodes.push(new XText(decodeEntities(text)));
      i = end === -1 ? n : end;
    }
  }
  return doc;
}

function escText(s) { return String(s).replace(/&/g, '&amp;').replace(/</g, '&lt;').replace(/>/g, '&gt;'); }
function escAttr(s) { return String(s).replace(/&/g, '&amp;').replace(/</g, '&lt;').replace(/"/g, '&quot;'); }

function serialize(el) {
  if (el.nodeType === 3) return escText(el.data);
  let s = '<' + el.tagName;
  for (const a of el.attributes) s += ' ' + a.nodeName + '="' + escAttr(a.nodeValue) + '"';
  if (el.childNodes.length === 0) return s + '/>';
  s += '>';
  for (const c of el.childNodes) s += serialize(c);
  return s + '</' + el.tagName + '>';
}

// ---------- globals the bundle expects ----------

global.window = {
  DOMParser: function () {
    this.parseFromString = (str) => parseXml(str);
  },
};
global.document = {
  implementation: { createDocument: () => new XDocument() },
};
global.XMLSerializer = function () {
  this.serializeToString = (el) => serialize(el);
};
// TextDecoder exists in node. DataView/ArrayBuffer native.
// proj4 (the reference's CRS dependency, README.md:11-13): the real bundled
// library, so non-WGS84 .prj reprojection (LCC/Albers/UTM…) runs the exact
// code path the reference runs in a browser.
global.proj4 = require('/root/reference/lib/proj4.js');

const fs = require('fs');
// dist/GeoConvert.js is a STALE build (src/DXF.js has newer features:
// bulge2arc, POLYLINE/SEQEND, closed flags). Concatenate src/ fresh in the
// gulpfile's order (/root/reference/gulpfile.js:10-19) — src is canonical.
const srcOrder = ['GeoConvert.js', 'XML.js', 'KML.js', 'KMZ.js', 'GPX.js',
  'ShapeFile.js', 'DXF.js', 'WKT.js'];
const bundle = srcOrder
  .map(f => fs.readFileSync('/root/reference/src/' + f, 'utf8')).join('\n');
eval(bundle);

// ---------- request handling ----------

const req = JSON.parse(fs.readFileSync(0, 'utf8'));
let out;
switch (req.op) {
  case 'kml2geojson':
    out = GeoConvert.kml2Geojson(req.input, true); break;
  case 'gpx2geojson':
    out = GeoConvert.gpx2Geojson(req.input, true); break;
  case 'wkt2geojson':
    out = GeoConvert.wkt2Geojson(req.input, true); break;
  case 'xml2json':
    out = GeoConvert.xml2Json(req.input, true); break;
  case 'geojson2kml':
    out = "<?xml version='1.0' encoding='UTF-8'?>" +
      new XMLSerializer().serializeToString(GeoConvert.geojson2Kml(req.input)); break;
  case 'geojson2gpx':
    out = "<?xml version='1.0' encoding='UTF-8'?>" +
      new XMLSerializer().serializeToString(GeoConvert.geojson2Gpx(req.input)); break;
  case 'bench_kml': {
    // single-node throughput baseline: convert n distinct KML docs
    const n = req.n;
    const t0 = process.hrtime.bigint();
    let chars = 0;
    for (let i = 0; i < n; i++) {
      const lon = ((i * 7919) % 360000) / 1000.0 - 180.0;
      const lat = ((i * 104729) % 170000) / 1000.0 - 85.0;
      const kml = '<kml><Document><Placemark><name>p' + i +
        '</name><Point><coordinates>' + lon + ',' + lat +
        '</coordinates></Point></Placemark></Document></kml>';
      chars += GeoConvert.kml2Geojson(kml, true).length;
    }
    const secs = Number(process.hrtime.bigint() - t0) / 1e9;
    out = JSON.stringify({ n, secs, docs_per_sec: n / secs, chars });
    break;
  }
  case 'dxf2geojson':
    out = GeoConvert.dxf2Geojson({ dxf: req.input, prj: req.prj }, true); break;
  case 'shp2geojson': {
    const shp = Uint8Array.from(Buffer.from(req.shpB64, 'base64')).buffer;
    const dbf = Uint8Array.from(Buffer.from(req.dbfB64, 'base64')).buffer;
    out = GeoConvert.shapefile2Geojson({ shp, dbf, prj: req.prj }, true);
    break;
  }
  case 'kmz2geojsons': {
    // the reference's only async path (KMZ.js promise fan-in + count
    // barrier) — run with the REAL jszip the reference bundles
    global.JSZip = require('/root/reference/lib/jszip.min.js');
    const kmz = Buffer.from(req.kmzB64, 'base64');
    GeoConvert.kmz2Geojsons(kmz, (geojsons) => {
      process.stdout.write(JSON.stringify(geojsons));
    });
    out = null; // async: written by the callback
    break;
  }
  default:
    throw new Error('unknown op ' + req.op);
}
if (out !== null) process.stdout.write(out);
