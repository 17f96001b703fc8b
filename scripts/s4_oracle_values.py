#!/usr/bin/env python3
"""Derive the s4_xlsx oracle literals with an INDEPENDENT stdlib parse.

DuckDB cannot read xlsx, so the s4_xlsx CORRECTNESS row cross-checks the
Scala OOXML reader (graft/sources/Xlsx.scala) against a second,
independent implementation in a different language: zipfile +
xml.etree over the same OOXML parts. Run against the reference's static
resource workbook; the printed aggregates are pinned as a VALUES table
in SparkEntry.oracleSql("s4_xlsx").

    python3 scripts/s4_oracle_values.py /root/reference/synth/data/access_request_rebuild.xlsx
"""
import sys
import zipfile
import xml.etree.ElementTree as ET

NS = '{http://schemas.openxmlformats.org/spreadsheetml/2006/main}'
RNS = '{http://schemas.openxmlformats.org/officeDocument/2006/relationships}'


def colidx(ref: str) -> int:
    acc = 0
    for ch in ref:
        if ch.isalpha():
            acc = acc * 26 + ord(ch.upper()) - 64
        else:
            break
    return acc - 1


def main(path: str) -> None:
    z = zipfile.ZipFile(path)
    wb = ET.fromstring(z.read('xl/workbook.xml'))
    rels = ET.fromstring(z.read('xl/_rels/workbook.xml.rels'))
    tgt = {r.get('Id'): r.get('Target') for r in rels}
    sheets = [(s.get('name'), 'xl/' + tgt[s.get(RNS + 'id')])
              for s in wb.iter(NS + 'sheet')]
    sst = [''.join(t.text or '' for t in si.iter(NS + 't'))
           for si in ET.fromstring(z.read('xl/sharedStrings.xml')).iter(NS + 'si')]

    for name, part in sorted(sheets):
        rows = []
        for row in ET.fromstring(z.read(part)).iter(NS + 'row'):
            r = {}
            for c in row.iter(NS + 'c'):
                v = c.find(NS + 'v')
                if v is None:
                    continue
                r[colidx(c.get('r'))] = sst[int(v.text)] if c.get('t') == 's' else v.text
            rows.append(r)
        data = rows[1:]  # header=0
        id_sum = sum(int(r[0]) for r in data)
        days_sum = sum(int(r[4]) for r in data) if name == 'AccessRequest' else None
        print(f"('{name}', CAST({len(data)} AS BIGINT), CAST({id_sum} AS BIGINT), "
              f"CAST({days_sum if days_sum is not None else 'NULL'} AS BIGINT))")


if __name__ == '__main__':
    main(sys.argv[1])
