#!/usr/bin/env python3
"""Generate raw-HTML .warc.gz members for the CorpusBuild --warc soak.

Each member: one warcinfo + N response records carrying HTTP+HTML.
Planted signals:
  - every record whose index i satisfies i % mirror_every == offset
    re-serves the CONTENT of record i-offset with different chrome
    (raw bytes differ; only extraction collapses the pair),
  - ~2%% revisit records (empty payload, digest pointing at an
    earlier URL) — ledger-only rows,
  - ~10%% pages served ISO-8859-1 and ~5%% windows-1252 (accented /
    curly-quote prose), the rest UTF-8 — exercises charset dispatch.

Usage: gen_html_warc.py <outdir> <members> <recs_per_member>
"""
import gzip, os, sys


def prose(i):
    # 120 unique non-stopword tokens -> quality ~1.0
    return " ".join(f"w{i}t{j}" for j in range(120))


def page(i, content_seed, charset):
    accent = ""
    if charset == "iso-8859-1":
        accent = " café séance déjà"
    elif charset == "windows-1252":
        accent = " it’s “quoted” – fine"
    body = prose(content_seed) + accent
    return "\n".join([
        "<html><head><title>Doc %d</title>" % content_seed,
        "<style>p { margin: 0; }</style>",
        "<script>var v = %d;</script></head><body>" % i,
        "<nav><a href='/'>Home</a> <a href='/%d'>Self</a> "
        "<a href='/rnd%d'>More</a></nav>" % (i, i * 7 % 1000),
        "<h1>Document %d</h1>" % content_seed,
        "<p>%s</p>" % body,
        "<footer><a href='/terms%d'>Terms</a></footer>"
        "</body></html>" % (i % 13),
    ])


def http(charset, html):
    body = html.encode(charset)
    head = ("HTTP/1.1 200 OK\r\nServer: graft-soak\r\n"
            "Content-Type: text/html; charset=%s\r\n\r\n"
            % charset).encode("ascii")
    return head + body


def rec(typ, rid, uri, date, ctype, payload, extra=()):
    head = ["WARC/1.0", "WARC-Type: %s" % typ,
            "WARC-Record-ID: <%s>" % rid]
    if uri:
        head.append("WARC-Target-URI: %s" % uri)
    head.append("WARC-Date: %s" % date)
    head.extend(extra)
    head.append("Content-Type: %s" % ctype)
    head.append("Content-Length: %d" % len(payload))
    head.append("")
    head.append("")
    return "\r\n".join(head).encode("ascii") + payload + b"\r\n\r\n"


def main():
    outdir, members, per = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.makedirs(outdir, exist_ok=True)
    mirror_every, offset = 50, 1999
    n_html = n_mirror = n_revisit = 0
    gi = 0
    for m in range(members):
        chunks = [rec("warcinfo", "urn:uuid:soak-wi-%d" % m, "",
                      "2026-08-14T00:00:00Z", "application/warc-fields",
                      b"software: graft-soak")]
        for k in range(per):
            i = gi
            gi += 1
            date = "2026-08-14T%02d:%02d:%02dZ" % (
                i // 3600 % 24, i // 60 % 60, i % 60)
            if i % 47 == 13 and i > offset:
                # revisit marker for an earlier URL
                n_revisit += 1
                chunks.append(rec(
                    "revisit", "urn:uuid:soak-rv-%d" % i,
                    "http://s%d.example.com/p%d" % (
                        (i - offset) % 97, i - offset),
                    date, "application/http;msgtype=revisit", b"",
                    ("WARC-Refers-To: <urn:uuid:soak-r-%d>"
                     % (i - offset),
                     "WARC-Payload-Digest: sha1:SOAK%d" % (i - offset))))
                continue
            seed = i
            if (i % mirror_every == offset % mirror_every
                    and i > offset and (i - offset) % 47 != 13):
                seed = i - offset  # mirror of an earlier HTML page
                n_mirror += 1
            # charset is a property of the CONTENT (seed) so a mirror
            # and its original decode to identical text
            charset = ("iso-8859-1" if seed % 10 == 3 else
                       "windows-1252" if seed % 20 == 7 else "utf-8")
            n_html += 1
            chunks.append(rec(
                "response", "urn:uuid:soak-r-%d" % i,
                "http://s%d.example.com/p%d" % (i % 97, i), date,
                "application/http;msgtype=response",
                http(charset, page(i, seed, charset))))
        with gzip.open(os.path.join(outdir, "m%04d.warc.gz" % m),
                       "wb", compresslevel=6) as f:
            f.write(b"".join(chunks))
    print("members=%d html=%d mirrors=%d revisits=%d "
          "expected_store=%d expected_ledger=%d"
          % (members, n_html, n_mirror, n_revisit,
             n_html - n_mirror, n_html + n_revisit))


if __name__ == "__main__":
    main()
