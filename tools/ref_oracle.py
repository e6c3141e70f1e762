#!/usr/bin/env python3
"""Independent test oracle replicating the reference spider's extraction
semantics (/root/reference/core/main.py) with CPython's `re` and
`html.unescape` — used ONLY to generate/check golden fixtures for the Scala
engine (never shipped in the library). DOM built with stdlib html.parser
(convert_charrefs=True decodes entities exactly as lxml hands decoded text to
parsel's ::text).

Usage: ref_oracle.py <dir>   # for each *.html writes *.expected.json
"""
import html as htmlmod
import json
import re
import sys
import urllib.parse
from html.parser import HTMLParser

VOID = {"img", "br", "hr", "meta", "link", "input"}


class Elem:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag, attrs):
        self.tag = tag
        self.attrs = dict(attrs)
        self.children = []  # Elem | str

    def descendants(self):
        for c in self.children:
            if isinstance(c, Elem):
                yield c
                yield from c.descendants()

    def text_nodes(self):
        out = []

        def walk(n):
            for c in n.children:
                if isinstance(c, str):
                    out.append(c)
                else:
                    walk(c)

        walk(self)
        return out

    def string_value(self):
        return "".join(self.text_nodes())

    def has_class(self, c):
        return c in (self.attrs.get("class") or "").split()


class TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Elem("#root", [])
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        e = Elem(tag, attrs)
        self.stack[-1].children.append(e)
        if tag not in VOID:
            self.stack.append(e)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(Elem(tag, attrs))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(s):
    tb = TreeBuilder()
    tb.feed(s)
    return tb.root


# --- reference text pipeline (core/main.py:16-72) ---------------------------

CHEM_FIXES = {
    "Mg 2+": "Mg2+", "Ca 2+": "Ca2+", "Na +": "Na+", "K +": "K+",
    "OH -": "OH-", "CO 3 2-": "CO32-", "SO 4 2-": "SO42-",
    "NO 3 -": "NO3-", "Cl -": "Cl-", "Na +1": "Na+1", "Na + ": "Na+",
}


def fix_chemical_formulas(text):
    if not text:
        return text
    text = re.sub(r"\b([A-Z][a-z]?)\s+(\d+)\s*([+-])\s*", r"\1\2\3", text)
    text = re.sub(r"\b([A-Z][a-z]?)\s+([+-])\s*", r"\1\2", text)
    text = re.sub(r"\b([A-Z][a-z]?[A-Z]?[a-z]?)\s+(\d*)\s*([+-])\s*", r"\1\2\3", text)
    for bad, good in CHEM_FIXES.items():
        text = text.replace(bad, good)
    return text


def clean_text(text):
    if not text:
        return ""
    text = htmlmod.unescape(text)
    text = re.sub(r"\s+", " ", text).strip()
    return fix_chemical_formulas(text)


def full_text(elem):
    if elem is None:
        return ""
    return clean_text(" ".join(elem.text_nodes()))


AD_KEYWORDS = ["sponsored", "advertise", "kuulchat media", "kuulpay.com",
               "get a professional", "affordable website", "management system"]


def is_advertisement(elem):
    t = full_text(elem).lower()
    return any(k in t for k in AD_KEYWORDS)


def is_ad_image(src):
    if not src:
        return True
    if "/qns/" in src:
        return False
    return any(p in src.lower() for p in ["banner", "ad", "sponsor", "promo"])


def fix_image_url(src):
    if "/" in src:
        base, fn = src.rsplit("/", 1)
        return f"{base}/{urllib.parse.quote(fn)}"
    return urllib.parse.quote(src)


def extract_all_diagrams(container):
    out, seen = [], set()
    imgs = [container] if container.tag == "img" else []
    imgs += [e for e in container.descendants() if e.tag == "img"]
    for img in imgs:
        src = img.attrs.get("src")
        if src and not is_ad_image(src):
            src = fix_image_url(src)
            if src not in seen:
                seen.add(src)
                out.append(src)
    return out


def extract_question_stem(question_part, num):
    text = re.sub(rf"^{num}\.?\s*", "", question_part)
    stem = re.split(r"\s+[A-D]\.\s+", text, maxsplit=1)[0].strip()
    return re.sub(r"\s+", " ", stem)


def extract_options_from_text(text):
    options = {"A": "", "B": "", "C": "", "D": ""}
    patterns = [
        r"([A-D])\.\s*([^A-D]*?)(?=\s+[A-D]\.|$)",
        r"([A-D])\s*\.\s*([^A-D]*?)(?=\s*[A-D]\s*\.|$)",
        r"([A-D])\s*\.?\s*([^\n]*?)(?=\s*[A-D]\s*\.|\n[A-D]\s*\.|$)",
    ]
    for pattern in patterns:
        for m in re.finditer(pattern, text, re.MULTILINE | re.DOTALL):
            letter, opt = m.group(1), m.group(2).strip()
            opt = re.sub(r"\s+", " ", opt)
            opt = re.sub(r"\.$", "", opt)
            opt = re.sub(r"^\s*[-•]\s*", "", opt)
            if letter in options and opt and not options[letter]:
                options[letter] = opt
    return options


def clean_solution_text(s):
    if not s:
        return ""
    s = re.sub(r"^solution\s*", "", s, flags=re.IGNORECASE)
    return re.sub(r"\s+", " ", s).strip()


def extract_answer_info(solution_text):
    if not solution_text:
        return None
    info = {}
    cs = solution_text.strip()
    for pattern in [r"answer is ([A-D])", r"correct answer is ([A-D])",
                    r"option ([A-D])", r"^([A-D])\."]:
        m = re.search(pattern, cs, re.IGNORECASE)
        if m:
            info["answer"] = m.group(1).upper()
            break
    info["solution"] = clean_solution_text(cs)
    return info


def extract_answer_from_html(container):
    elems = [container] + list(container.descendants())
    for e in elems:
        if ((e.tag == "span" and "✓" in e.string_value())
                or e.has_class("correct") or "data-answer" in e.attrs):
            m = re.search(r"([A-D])", full_text(e))
            if m:
                return m.group(1).upper()
    for e in elems:
        if (e.tag == "div" and "Solution" in e.string_value()) or e.has_class("solution"):
            if "light to electrical" in full_text(e).lower():
                return "B"
    return None


def parse_objective(container):
    full = full_text(container)
    m = re.search(r"(\d+)\.", full)
    if not m:
        return None
    num = int(m.group(1))
    parts = re.split(r"\s+(?:Mark|Solution)\s+", full, maxsplit=1)
    qpart = parts[0]
    spart = parts[1] if len(parts) > 1 else ""
    qtext = extract_question_stem(qpart, num)
    options = extract_options_from_text(qpart)
    info = extract_answer_info(spart)
    if not info or not info.get("answer"):
        ha = extract_answer_from_html(container)
        if ha:
            info = info or {}
            info["answer"] = ha
    diagrams = extract_all_diagrams(container)
    if qtext and any(options.values()) and num > 0:
        r = {"section": "objective", "type": "mcq", "number": num,
             "question": qtext, "options": options,
             "diagrams": diagrams if diagrams else []}
        if info:
            r.update(info)
        return r
    return None


def parse_sub_subparts(content):
    parts = re.split(r"\s*\(([ivx]+|[a-z])\)\s*", content)
    if len(parts) < 3:
        return []
    out = []
    for i in range(1, len(parts), 2):
        if i + 1 < len(parts):
            sc = parts[i + 1].strip()
            if sc:
                out.append({"part": f"({parts[i]})", "question": sc})
    return out


def parse_theory_structure(question_part, num):
    content = re.sub(rf"^{num}\.?\s*", "", question_part)
    main_parts = re.split(r"\s*\(([a-d])\)\s*", content)
    if len(main_parts) < 3:
        return content.strip(), []
    main_q = main_parts[0].strip()
    subparts = []
    for i in range(1, len(main_parts), 2):
        if i + 1 < len(main_parts):
            pc = main_parts[i + 1].strip()
            subs = parse_sub_subparts(pc)
            subparts.append({"part": f"({main_parts[i]})",
                             "question": pc if not subs else "",
                             "subparts": subs})
    return main_q, subparts


def integrate_theory_solutions(subparts, solution_part):
    for sp in subparts:
        letter = sp["part"].strip("()")
        m = re.search(rf"\({letter}\)(.*?)(?=\([a-d]\)|$)", solution_part, re.DOTALL)
        if m:
            sp["solution"] = m.group(1).strip()
    return subparts


def parse_theory(container):
    full = full_text(container)
    m = re.search(r"(\d+)\.", full)
    if not m:
        return None
    num = int(m.group(1))
    parts = re.split(r"\s+Show Solution\s+", full, maxsplit=1)
    qpart = parts[0]
    spart = parts[1] if len(parts) > 1 else ""
    main_q, subparts = parse_theory_structure(qpart, num)
    if spart:
        subparts = integrate_theory_solutions(subparts, spart)
    diagrams = extract_all_diagrams(container)
    if main_q or subparts:
        return {"section": "theory", "type": "theory", "number": num,
                "question": main_q, "subparts": subparts,
                "diagrams": diagrams if diagrams else []}
    return None


def find_header(root, title):
    def walk(parent):
        for i, c in enumerate(parent.children):
            if isinstance(c, Elem):
                if c.tag == "h4" and c.has_class("center") and title in c.string_value():
                    return parent, i
                r = walk(c)
                if r:
                    return r
        return None
    return walk(root)


def siblings_after(parent, idx):
    return [c for c in parent.children[idx + 1:] if isinstance(c, Elem)]


def extract_objective_questions(root):
    loc = find_header(root, "OBJECTIVE TEST")
    if not loc:
        return []
    out = []
    for sib in siblings_after(*loc):
        if "THEORY QUESTIONS" in full_text(sib):
            break
        if is_advertisement(sib):
            continue
        if re.search(r"\b\d+\.\s+", full_text(sib)):
            q = parse_objective(sib)
            if q:
                out.append(q)
    out.sort(key=lambda x: x.get("number", 0))
    return out


def extract_theory_questions(root):
    loc = find_header(root, "THEORY QUESTIONS")
    if not loc:
        return []
    out = []
    for sib in siblings_after(*loc):
        if is_advertisement(sib):
            continue
        if re.search(r"\b\d+\.\s+", full_text(sib)):
            q = parse_theory(sib)
            if q:
                out.append(q)
    out.sort(key=lambda x: x.get("number", 0))
    seen, uniq = set(), []
    for q in out:
        if q["number"] not in seen:
            seen.add(q["number"])
            uniq.append(q)
    return uniq


def extract_next(root):
    for e in root.descendants():
        if e.tag == "a" and e.has_class("next") and "href" in e.attrs:
            return e.attrs["href"]
        if e.has_class("pagination"):
            for a in e.descendants():
                if a.tag == "a" and "Next" in a.string_value() and "href" in a.attrs:
                    return a.attrs["href"]
    return None


def parse_page(html_str):
    root = parse_html(html_str)
    qs = extract_objective_questions(root) + extract_theory_questions(root)
    return {
        "text": full_text(root),
        "next": extract_next(root),
        "questions": qs,
    }


def main():
    import pathlib
    d = pathlib.Path(sys.argv[1])
    mode = sys.argv[2] if len(sys.argv) > 2 else ""
    for f in sorted(d.glob("*.html")):
        page = parse_page(f.read_text(encoding="utf-8"))
        if mode == "--canonical":
            # compact, sorted keys — byte-comparable with Json.canonicalQuestion
            out = f.with_suffix(".json")
            out.write_text(json.dumps(page, ensure_ascii=False, sort_keys=True,
                                      separators=(",", ":")),
                           encoding="utf-8")
        elif mode == "--ordered":
            # compact, dict-INSERTION order preserved — the reference's true
            # key order (incl. the F9 fallback's ..., solution, answer);
            # byte-comparable with Json.question
            out = pathlib.Path(str(f)[:-5] + ".ordered.json")
            out.write_text(json.dumps(page, ensure_ascii=False,
                                      separators=(",", ":")),
                           encoding="utf-8")
        else:
            out = f.with_suffix(".expected.json")
            out.write_text(json.dumps(page, ensure_ascii=False, sort_keys=True,
                                      indent=1), encoding="utf-8")
    print("oracle: done")


if __name__ == "__main__":
    main()
