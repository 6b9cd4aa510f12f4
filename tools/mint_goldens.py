#!/usr/bin/env python3
"""Mint golden outputs by running the built C reference over its fixtures.

Run once (reference binaries live in /tmp/refbuild, built from the
read-only /root/reference sources). Produces tests/goldens/goldens.json:

  cases: list of
    {case, mode: document|fragment, context, file,
     dump, serialized (document only), error_count}

The dump stored here is the raw stdout of ./parse_html with the
"--- path ---" title line removed and the single trailing blank line
stripped (parse_file_demo.c:88-91 prints title + dump + "\n").
Fragment dumps keep everything after the "ASCII Tree (Fragment)" title.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REFBUILD = "/tmp/refbuild"
TESTS = os.path.join(REFBUILD, "tests")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                   "goldens.json")

# fragment cases from tests/run_fragment_tests.sh:60-273
FRAGMENT_CASES = [
    ("div", "frag_01_table_in_div.html"),
    ("table", "frag_02_td_x.html"),
    ("tr", "frag_02_td_x.html"),
    ("div", "frag_03_foster_in_div.html"),
    ("div", "frag_04_formatting_misnest.html"),
    ("div", "frag_05_p_table_close.html"),
    ("select", "frag_06_option_autoclose.html"),
    ("div", "frag_07_button_p.html"),
    ("div", "frag_08_script_data.html"),
    ("div", "frag_09_textarea_rcdata.html"),
    ("div", "frag_10_template.html"),
    ("div", "frag_11_head_in_body.html"),
    ("div", "frag_12_mixed_scope.html"),
]

EXTRA_FRAGMENT_CONTEXTS = ["div", "td", "template", "title", "script",
                           "table", "tr", "tbody", "select", "caption",
                           "textarea", "style", "p", "head",
                           # round 2: foreign-content + rare contexts
                           "svg", "math", "foreignObject", "mi",
                           "annotation-xml", "option", "optgroup",
                           "colgroup", "frameset", "noscript", "body",
                           "html",
                           # round 2b: scope/list/table-section contexts
                           "a", "li", "ul", "ol", "button", "form",
                           "marquee", "object", "dl", "dt", "dd", "col",
                           "thead", "tfoot", "th", "pre", "blockquote",
                           "span", "b", "em"]


def run(cmd, env=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    p = subprocess.run(cmd, cwd=REFBUILD, capture_output=True, env=e)
    return p.returncode, p.stdout.decode("utf-8", errors="surrogateescape"), \
        p.stderr.decode("utf-8", errors="surrogateescape")


def count_parse_errors(stderr: str) -> int:
    return sum(1 for ln in stderr.splitlines() if ln.startswith("[parse error]"))


def parse_error_texts(stderr: str) -> list[str]:
    """stderr lines minus the '[parse error] ' prefix — the texts the
    kernel must reproduce verbatim (tokenizer lines carry
    'line=N col=M: msg', tree-builder/charref lines the bare msg)."""
    pre = "[parse error] "
    return [
        ln[len(pre):] for ln in stderr.splitlines() if ln.startswith(pre)
    ]


# Synthetic stress inputs minted with EMBEDDED bytes (input_b64): the
# refbuild tests dir is recreated from the read-only reference, so
# these cannot live there as files. Family chosen from fuzz-found weak
# spots: template x table-section interplay (the r3 order-of-read
# regression), foster parenting + templates, AAA over table modes.
SYNTH_DOC_CASES = [
    ("synth_tmpl_thead_eof", "<tbody><template ><thead"),
    ("synth_tmpl_thead_closed", "<tbody><template><thead></thead>"),
    ("synth_tmpl_tbody_thead", "<template><tbody><thead>x"),
    ("synth_tmpl_tfoot_eof", "<tbody><template ><tfoot"),
    ("synth_tmpl_colgroup", "<table><template><colgroup>"),
    ("synth_tmpl_caption", "<tr><template><caption>y</caption></template>"),
    ("synth_tmpl_table_in_tmpl", "<template><table><td>z"),
    ("synth_tmpl_select", "<td><template><select><option>o"),
    ("synth_tmpl_nested", "<template><template><tr><td>n"),
    ("synth_tmpl_form", "<template><form><input><form>"),
    ("synth_foster_tmpl", "<table><template>x</template>y</table>"),
    ("synth_tbody_b_thead", "<tbody><b><thead>t"),
    ("synth_table_tr_tmpl_td", "<table><tr><template><td>c"),
    ("synth_aaa_table", "<b><table><td></b><i></table>w"),
    ("synth_section_after_html", "</html><thead>q"),
    ("synth_tmpl_frameset", "<template><frameset>"),
    ("synth_tmpl_head_meta", "<template><meta charset='x'><title>t"),
    ("synth_tmpl_script_raw", "<template><script><td></script><td>s"),
]


def main():
    fixtures = sorted(
        f for f in os.listdir(TESTS) if f.endswith(".html")
    )
    cases = []

    import base64

    for name, html in SYNTH_DOC_CASES:
        tmp = os.path.join(TESTS, "_synth_case.html")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(html)
        rel = "tests/_synth_case.html"
        rc, out, _ = run(["./parse_html", rel])
        if rc != 0:
            print(f"SKIP synth {name}: rc={rc}", file=sys.stderr)
            continue
        lines = out.split("\n")
        assert lines[0].startswith("--- "), lines[0]
        dump = "\n".join(lines[1:])
        if dump.endswith("\n"):
            dump = dump[:-1]
        _, _, err = run(["./parse_html", rel],
                        env={"HTMLPARSER_PARSE_ERRORS": "1"})
        rc2, ser, _ = run(["./serialize_demo", rel])
        cases.append({
            "case": name,
            "mode": "document",
            "context": None,
            "file": None,
            "input_b64": base64.b64encode(
                html.encode("utf-8")).decode("ascii"),
            "dump": dump,
            "serialized": ser if rc2 == 0 else None,
            "error_count": count_parse_errors(err),
            "errors": parse_error_texts(err),
        })
    if os.path.exists(os.path.join(TESTS, "_synth_case.html")):
        os.unlink(os.path.join(TESTS, "_synth_case.html"))
    for fx in fixtures:
        rel = f"tests/{fx}"
        rc, out, _ = run(["./parse_html", rel])
        if rc != 0:
            print(f"SKIP document {fx}: rc={rc}", file=sys.stderr)
            continue
        lines = out.split("\n")
        # strip "--- path ---" title and the demo's trailing "\n"
        assert lines[0].startswith("--- "), lines[0]
        dump = "\n".join(lines[1:])
        if dump.endswith("\n"):
            dump = dump[:-1]
        _, _, err = run(["./parse_html", rel],
                        env={"HTMLPARSER_PARSE_ERRORS": "1"})
        rc2, ser, _ = run(["./serialize_demo", rel])
        cases.append({
            "case": fx[:-5],
            "mode": "document",
            "context": None,
            "file": rel,
            "dump": dump,
            "serialized": ser if rc2 == 0 else None,
            "error_count": count_parse_errors(err),
            "errors": parse_error_texts(err),
        })

    frag_set = set(FRAGMENT_CASES)
    for fx in fixtures:
        for ctx in EXTRA_FRAGMENT_CONTEXTS:
            if fx.startswith("encoding_"):
                continue  # fragments inherit encoding; skip byte-level cases
            frag_set.add((ctx, fx))

    for ctx, fx in sorted(frag_set):
        rel = f"tests/{fx}"
        rc, out, _ = run(["./parse_fragment_demo", ctx, rel])
        if rc != 0:
            print(f"SKIP fragment {ctx} {fx}: rc={rc}", file=sys.stderr)
            continue
        lines = out.split("\n")
        assert lines[0] == "ASCII Tree (Fragment)", lines[0]
        dump = "\n".join(lines[1:])
        _, _, err = run(["./parse_fragment_demo", ctx, rel],
                        env={"HTMLPARSER_PARSE_ERRORS": "1"})
        cases.append({
            "case": f"{fx[:-5]}@{ctx}",
            "mode": "fragment",
            "context": ctx,
            "file": rel,
            "dump": dump,
            "serialized": None,
            "error_count": count_parse_errors(err),
            "errors": parse_error_texts(err),
        })

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump({"cases": cases}, f, ensure_ascii=True, indent=1)
    print(f"minted {len(cases)} golden cases -> {OUT}")


if __name__ == "__main__":
    main()
