"""Star-allele (CYP) and blood-group (RBG) database conversion.

Equivalents of hisatgenotype_extract_cyp_data.py (#23) and
hisatgenotype_extract_RBG.py (#24): both reference tools scrape remote
databases and render per-allele variant lists against a reference
sequence into MSF alignments.  Offline, the same conversion runs from
local variant tables:

  <allele name> <tab> <comma-separated events>
  events: <pos><ref>><alt>    SNP        e.g. 100A>G
          <pos>del<len>       deletion   e.g. 230del2
          <pos>ins<SEQ>       insertion  e.g. 58insTT

Positions are 0-based against the supplied reference sequence; the
reference tool's NT-position validation (checkNTloc,
extract_cyp_data.py:184) is enforced for SNPs.
"""
from __future__ import annotations

import re
from collections import defaultdict

_SNP = re.compile(r"^(\d+)([ACGT])>([ACGT])$")
_DEL = re.compile(r"^(\d+)del(\d+)$")
_INS = re.compile(r"^(\d+)ins([ACGT]+)$")


def parse_events(s: str):
    events = []
    for tok in s.split(","):
        tok = tok.strip()
        if not tok or tok == "ref":
            continue
        m = _SNP.match(tok)
        if m:
            events.append(("S", int(m.group(1)), m.group(2), m.group(3)))
            continue
        m = _DEL.match(tok)
        if m:
            events.append(("D", int(m.group(1)), int(m.group(2)), None))
            continue
        m = _INS.match(tok)
        if m:
            events.append(("I", int(m.group(1)), m.group(2), None))
            continue
        raise ValueError("bad event: %r" % tok)
    return events


def msa_from_variant_table(refseq: str, allele_events: dict):
    """{allele: [events]} -> (names, rows) MSA including the reference
    allele as the first row."""
    # insertion slots: pos -> max inserted length
    ins_len = defaultdict(int)
    for events in allele_events.values():
        for ev in events:
            if ev[0] == "I":
                ins_len[ev[1]] = max(ins_len[ev[1]], len(ev[2]))
    names = []
    rows = []
    for name, events in allele_events.items():
        snp = {}
        dele = set()
        ins = {}
        for ev in events:
            kind, pos = ev[0], ev[1]
            if kind == "S":
                assert refseq[pos] == ev[2], \
                    "NT validation failed for %s at %d" % (name, pos)
                snp[pos] = ev[3]
            elif kind == "D":
                dele.update(range(pos, pos + ev[2]))
            else:
                ins[pos] = ev[2]
        row = []
        for p in range(len(refseq) + 1):
            if p in ins_len:
                i_seq = ins.get(p, "")
                row.append(i_seq + "." * (ins_len[p] - len(i_seq)))
            if p == len(refseq):
                break
            if p in dele:
                row.append(".")
            else:
                row.append(snp.get(p, refseq[p]))
        names.append(name)
        rows.append("".join(row))
    return names, rows


def convert_star_table(path, refseq: str):
    allele_events = {}
    for line in open(path):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split("\t")
        name = parts[0]
        events = parse_events(parts[1]) if len(parts) > 1 else []
        allele_events[name] = events
    return msa_from_variant_table(refseq, allele_events)
