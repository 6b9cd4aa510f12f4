/* _fastscan: optional C accelerator for the pure-Python HTML tokenizer.
 *
 * Architecture: an ALL-OR-NOTHING pre-scanner.  make_feed(text, errors)
 * tokenizes the whole document in one C pass and returns a feed object
 * the tree builder can drive exactly like kernel.tokenizer.Tokenizer
 * (next() -> scratch token; .state / .allow_cdata / .errors / .skipped
 * attributes).  The scanner accepts only the subset of inputs on which
 * it is PROVABLY token-identical AND error-identical to the Python
 * state machine.  Since round 7's widening that subset includes the
 * ERROR-EMITTING constructs whose recovery is context-free — bogus
 * markup declarations, literal-'<' invalid end tags, end-tag
 * trailing garbage, every comment-machine error shape (exact 10-state
 * mirror), DOCTYPE error shapes (with force_quirks), the full
 * attribute-machine error mirror (per-BYTE bad-name-char errors,
 * recoverable '=' / missing-value / self-closing-slash errors, silent
 * EOF recoveries), and <plaintext> — with positioned "line=N col=M"
 * error strings built by a _line_col mirror that reproduces the
 * reference's stale positions across raw-scan skipped ranges.  What
 * still bails is the genuinely context-coupled rest: tree-builder
 * FEEDBACK (raw/CDATA entry after foreign content, fragment contexts
 * whose builder could flip allow_cdata), preprocessing (NULs,
 * surrogate escapes, the meta re-encode handshake), and charref
 * attempts the decode delegation cannot guarantee.  On a bail the
 * caller falls back to the Python tokenizer for the WHOLE document,
 * so parity holds by construction; the differential tests in
 * tests/test_fastscan.py verify token-by-token and error-by-error.
 *
 * This file is written against the *Python* kernel in this repository
 * (kernel/tokenizer.py), which itself documents behavioral citations
 * into the reference C tokenizer.  It is NOT a port of the reference:
 * the reference is an incremental 80-state machine; this is a
 * whole-document subset scanner with a bail-out.
 *
 * Behavioral notes replicated exactly (see kernel/tokenizer.py):
 *  - duplicate attribute names are DROPPED silently (_append_attr)
 *  - AFTER_ATTR_NAME does NOT reset the name buffer: <a x y> yields
 *    attrs ("x",""), ("xy","")
 *  - unquoted attribute values keep '/' (<a href=foo/> -> "foo/",
 *    not self-closing)
 *  - after a quoted value the machine returns to BEFORE_ATTR_NAME
 *    directly: <a x="1"y="2"> is error-free
 *  - bare '<' before a non-special char is a literal '<' CHARACTER
 *    token with NO error; '</' + non-alpha errors AND emits the
 *    literal '<' (both mirrored)
 *  - </name ...> errors at the first garbage char and skips to '>'
 *  - <!DOCTYPE: optional ws, name run, then optionally PUBLIC/SYSTEM
 *    ids (ids ASCII-lowered; a missing SECOND public id is silent;
 *    missing name / missing quote / unclosed quote error and set
 *    force_quirks, partial ids captured to EOF), silent skip to '>'
 *  - raw elements (title textarea style xmp iframe noembed noframes
 *    script) emit their body as ONE character token ending just
 *    before the matching "</name[ws / >]" terminator; entering the
 *    raw state does NOT depend on self_closing
 *  - <script> content runs an exact 18-state script-data DFA mirror
 *    (escaped AND double-escaped bodies in-subset)
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <structmember.h>
#include <string.h>

/* token types (kernel/tokenizer.py) */
#define T_DOCTYPE 0
#define T_START   1
#define T_END     2
#define T_COMMENT 3
#define T_CHAR    4
#define T_EOF     5

/* tokenizer states the builder observes (kernel/tokenizer.py) */
#define S_DATA    0
#define S_RCDATA  1
#define S_RAWTEXT 2
#define S_SCRIPT  3

/* ------------------------------------------------------------------ */
/* FastToken: duck-types kernel.tokenizer.Token (slots read by the     */
/* tree builder; never mutated by it — verified by grep + tests)       */
/* ------------------------------------------------------------------ */

typedef struct {
    PyObject_HEAD
    int type;
    PyObject *name;        /* str | None */
    PyObject *public_id;   /* always None in the accepted subset */
    PyObject *system_id;   /* always None */
    PyObject *data;        /* str | None */
    PyObject *attrs;       /* list[(str, str)] */
    char self_closing;
    char force_quirks;     /* always False in the accepted subset */
} FastToken;

static void
FastToken_dealloc(FastToken *self)
{
    Py_XDECREF(self->name);
    Py_XDECREF(self->public_id);
    Py_XDECREF(self->system_id);
    Py_XDECREF(self->data);
    Py_XDECREF(self->attrs);
    Py_TYPE(self)->tp_free((PyObject *)self);
}

static PyMemberDef FastToken_members[] = {
    {"type", T_INT, offsetof(FastToken, type), 0, NULL},
    {"name", T_OBJECT, offsetof(FastToken, name), 0, NULL},
    {"public_id", T_OBJECT, offsetof(FastToken, public_id), 0, NULL},
    {"system_id", T_OBJECT, offsetof(FastToken, system_id), 0, NULL},
    {"data", T_OBJECT, offsetof(FastToken, data), 0, NULL},
    {"attrs", T_OBJECT, offsetof(FastToken, attrs), 0, NULL},
    {"self_closing", T_BOOL, offsetof(FastToken, self_closing), 0, NULL},
    {"force_quirks", T_BOOL, offsetof(FastToken, force_quirks), 0, NULL},
    {NULL}
};

static PyTypeObject FastToken_Type = {
    PyVarObject_HEAD_INIT(NULL, 0)
    .tp_name = "_fastscan.FastToken",
    .tp_basicsize = sizeof(FastToken),
    .tp_dealloc = (destructor)FastToken_dealloc,
    .tp_flags = Py_TPFLAGS_DEFAULT,
    .tp_members = FastToken_members,
    .tp_new = PyType_GenericNew,
};

/* ------------------------------------------------------------------ */
/* token records produced by the scan                                  */
/* ------------------------------------------------------------------ */

typedef struct {
    unsigned char type;
    unsigned char self_closing;
    unsigned char state_after;  /* state the builder reads after this token */
    unsigned char force_quirks; /* DOCTYPE error shapes only */
    PyObject *name;             /* owned | NULL */
    PyObject *data;             /* owned | NULL */
    PyObject *attrs;            /* owned list | NULL (=> shared empty) */
    PyObject *errs;             /* owned list | NULL: charref-decode
                                   errors, appended to the shared
                                   errors list when the token is
                                   PULLED — the Python tokenizer
                                   appends them at production time,
                                   so deferral preserves interleaving
                                   with builder-side errors exactly */
} TokRec;

typedef struct {
    TokRec *recs;
    Py_ssize_t n, cap;
} RecBuf;

static int
recbuf_push(RecBuf *rb, TokRec r)
{
    if (rb->n == rb->cap) {
        Py_ssize_t newcap = rb->cap ? rb->cap * 2 : 256;
        TokRec *nr = PyMem_Realloc(rb->recs, newcap * sizeof(TokRec));
        if (!nr) return -1;
        rb->recs = nr;
        rb->cap = newcap;
    }
    rb->recs[rb->n++] = r;
    return 0;
}

static void
recbuf_clear(RecBuf *rb)
{
    for (Py_ssize_t i = 0; i < rb->n; i++) {
        Py_XDECREF(rb->recs[i].name);
        Py_XDECREF(rb->recs[i].data);
        Py_XDECREF(rb->recs[i].attrs);
        Py_XDECREF(rb->recs[i].errs);
    }
    PyMem_Free(rb->recs);
    rb->recs = NULL;
    rb->n = rb->cap = 0;
}

/* ------------------------------------------------------------------ */
/* FastFeed                                                            */
/* ------------------------------------------------------------------ */

typedef struct {
    PyObject_HEAD
    PyObject *text;        /* keeps slices' owner alive (substrings copy,
                              but keep a ref for debuggability anyway) */
    TokRec *recs;
    Py_ssize_t n, i;
    FastToken *scratch;
    int state;             /* builder reads tz.state */
    PyObject *raw_tag;     /* builder may read/write (svg-title path
                              can't trigger in the subset, but keep the
                              attribute for interface parity) */
    char allow_cdata;      /* builder writes this every token */
    PyObject *errors;      /* shared list; tokenizer-side errors ride
                              the records and append at pull time */
    PyObject *skipped;     /* raw-scan ranges (complete up front) */
} FastFeed;

static PyObject *EMPTY_ATTRS;   /* shared [] for attr-less tokens; the
                                   builder only iterates/copies token
                                   attrs (tests assert it stays empty) */

static void
FastFeed_dealloc(FastFeed *self)
{
    for (Py_ssize_t k = 0; k < self->n; k++) {
        Py_XDECREF(self->recs[k].name);
        Py_XDECREF(self->recs[k].data);
        Py_XDECREF(self->recs[k].attrs);
        Py_XDECREF(self->recs[k].errs);
    }
    PyMem_Free(self->recs);
    Py_XDECREF(self->text);
    Py_XDECREF(self->scratch);
    Py_XDECREF(self->raw_tag);
    Py_XDECREF(self->errors);
    Py_XDECREF(self->skipped);
    Py_TYPE(self)->tp_free((PyObject *)self);
}

static PyObject *
FastFeed_next(FastFeed *self, PyObject *Py_UNUSED(ignored))
{
    FastToken *t = self->scratch;
    if (self->i < self->n) {
        TokRec *r = &self->recs[self->i++];
        if (r->errs) {
            /* charref-decode errors surface at PRODUCTION time, like
               the Python tokenizer — so they interleave with builder
               errors identically */
            for (Py_ssize_t k = 0; k < PyList_GET_SIZE(r->errs); k++) {
                PyObject *item = PyList_GET_ITEM(r->errs, k);
                if (PyList_Check(self->errors)) {
                    if (PyList_Append(self->errors, item) < 0)
                        return NULL;
                } else {
                    PyObject *rv = PyObject_CallMethod(
                        self->errors, "append", "O", item);
                    if (!rv) return NULL;
                    Py_DECREF(rv);
                }
            }
            Py_CLEAR(r->errs);  /* scratch reuse: append exactly once */
        }
        t->type = r->type;
        Py_INCREF(r->name ? r->name : Py_None);
        Py_XSETREF(t->name, r->name ? r->name : Py_None);
        if (r->type == T_DOCTYPE) {
            /* DOCTYPE records carry public/system ids in the unused
               (data, attrs) slots; builder-visible data stays None
               and attrs stays the shared empty list, like the
               Python scratch token */
            Py_INCREF(r->data ? r->data : Py_None);
            Py_XSETREF(t->public_id, r->data ? r->data : Py_None);
            Py_INCREF(r->attrs ? r->attrs : Py_None);
            Py_XSETREF(t->system_id, r->attrs ? r->attrs : Py_None);
            Py_INCREF(Py_None);
            Py_XSETREF(t->data, Py_None);
            Py_INCREF(EMPTY_ATTRS);
            Py_XSETREF(t->attrs, EMPTY_ATTRS);
        } else {
            /* typed scratch reset: ids only survive a DOCTYPE token
               itself (Tokenizer.next clears them on the following
               pull) */
            if (t->public_id != Py_None) {
                Py_INCREF(Py_None);
                Py_XSETREF(t->public_id, Py_None);
            }
            if (t->system_id != Py_None) {
                Py_INCREF(Py_None);
                Py_XSETREF(t->system_id, Py_None);
            }
            Py_INCREF(r->data ? r->data : Py_None);
            Py_XSETREF(t->data, r->data ? r->data : Py_None);
            Py_INCREF(r->attrs ? r->attrs : EMPTY_ATTRS);
            Py_XSETREF(t->attrs, r->attrs ? r->attrs : EMPTY_ATTRS);
        }
        t->self_closing = r->self_closing;
        t->force_quirks = r->force_quirks;
        self->state = r->state_after;
    } else {
        t->type = T_EOF;
        Py_INCREF(Py_None);
        Py_XSETREF(t->name, Py_None);
        if (t->public_id != Py_None) {
            Py_INCREF(Py_None);
            Py_XSETREF(t->public_id, Py_None);
        }
        if (t->system_id != Py_None) {
            Py_INCREF(Py_None);
            Py_XSETREF(t->system_id, Py_None);
        }
        Py_INCREF(Py_None);
        Py_XSETREF(t->data, Py_None);
        Py_INCREF(EMPTY_ATTRS);
        Py_XSETREF(t->attrs, EMPTY_ATTRS);
        t->self_closing = 0;
        t->force_quirks = 0;
        /* state stays at the last record's state_after: the Python
           machine reports the state it was IN when input ran out —
           e.g. "<script>" + EOF (empty raw body) stays in the raw
           state, while a nonempty body's CHARACTER record already
           carried S_DATA (differential: test_fastscan EOF states). */
    }
    Py_INCREF(t);
    return (PyObject *)t;
}

static PyMethodDef FastFeed_methods[] = {
    {"next", (PyCFunction)FastFeed_next, METH_NOARGS, NULL},
    {NULL}
};

static PyMemberDef FastFeed_members[] = {
    {"state", T_INT, offsetof(FastFeed, state), 0, NULL},
    {"raw_tag", T_OBJECT, offsetof(FastFeed, raw_tag), 0, NULL},
    {"allow_cdata", T_BOOL, offsetof(FastFeed, allow_cdata), 0, NULL},
    {"errors", T_OBJECT, offsetof(FastFeed, errors), 0, NULL},
    {"skipped", T_OBJECT, offsetof(FastFeed, skipped), 0, NULL},
    {NULL}
};

static PyTypeObject FastFeed_Type = {
    PyVarObject_HEAD_INIT(NULL, 0)
    .tp_name = "_fastscan.FastFeed",
    .tp_basicsize = sizeof(FastFeed),
    .tp_dealloc = (destructor)FastFeed_dealloc,
    .tp_flags = Py_TPFLAGS_DEFAULT,
    .tp_methods = FastFeed_methods,
    .tp_members = FastFeed_members,
};

/* ------------------------------------------------------------------ */
/* scanner                                                             */
/* ------------------------------------------------------------------ */

typedef struct { Py_ssize_t a, b; } SkipRange;

typedef struct {
    PyObject *text;
    int kind;
    const void *data;
    Py_ssize_t n;
    RecBuf rb;
    PyObject *interns;      /* dict: name -> name (dedup allocations) */
    const char *bail;       /* reason, NULL while OK */
    PyObject *decode_fn;    /* borrowed: charref.decode_character_
                               references, or NULL (then any charref
                               attempt bails) */
    PyObject *pending_errs; /* owned list | NULL: decode errors for the
                               token currently being assembled; emit()
                               steals it into the TokRec */
    int seen_foreign;       /* sticky: a <svg>/<math> start tag was
                               emitted.  From then on any raw-state
                               trigger tag bails (see done: below) */
    /* positioned-error support (tokenizer._error/_line_col mirror):
       raw-scan char ranges consumed without advance() — the
       reference's line/col counters never see them, so reported
       positions are deliberately stale across raw scans — plus the
       incremental (pos, line, col, skip_idx) cursor the error path
       resumes from.  Queries are monotonic during a scan (errors
       occur in document order), matching the Python cache's
       cacheable case. */
    SkipRange *skips;
    Py_ssize_t n_skips, cap_skips;
    Py_ssize_t lc_pos, lc_skip;
    long lc_line, lc_col;
} Scan;

#define RD(sc, i) PyUnicode_READ((sc)->kind, (sc)->data, (i))

static int
is_ws(Py_UCS4 c)
{
    return c == ' ' || c == '\n' || c == '\t' || c == '\f' || c == '\r';
}

static int
is_alpha(Py_UCS4 c)
{
    return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z');
}

static int
attr_name_ok(Py_UCS4 c)
{
    /* _ATTR_NAME_BAD = [^0-9A-Za-z\-_:] -> error -> bail */
    return (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z')
        || (c >= 'A' && c <= 'Z') || c == '-' || c == '_' || c == ':';
}

/* Literal-ampersand guard over a charref-processing region (data
 * runs, RCDATA bodies, attribute values).  The Python machine leaves
 * '&' literal — same coalesced run, NO error — exactly when the next
 * input char is not [0-9A-Za-z#] (probed: "a & b", "a &; b", "x&",
 * "&<p>", attr "1 && 2", rcdata "1 & 2").  Anything that could start
 * a named/numeric reference attempt may decode or error (note this
 * kernel decodes semicolonless "&amp" too), so the scanner refuses
 * those documents.  The char AFTER the region boundary is the correct
 * lookahead for a trailing '&' (quote, '<', or EOF all mean literal).
 * Returns 1 if the region is charref-free-literal, 0 if the caller
 * must bail. */
static int
amp_region_ok(Scan *sc, Py_ssize_t a, Py_ssize_t e)
{
    Py_ssize_t k = a;
    while (1) {
        k = PyUnicode_FindChar(sc->text, '&', k, e, 1);
        if (k == -2) { PyErr_Clear(); return 0; }  /* bail, stay safe */
        if (k < 0) return 1;
        if (k + 1 < sc->n) {
            Py_UCS4 c = RD(sc, k + 1);
            if (c == '#' || (c >= '0' && c <= '9')
                || (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))
                return 0;
        }
        k++;
    }
}

static Py_ssize_t
find_char(Scan *sc, Py_UCS4 ch, Py_ssize_t from)
{
    Py_ssize_t r = PyUnicode_FindChar(sc->text, ch, from, sc->n, 1);
    return r; /* -1 == not found (and -2 on error, checked by caller) */
}

/* Exact mirror of tokenizer._process_script_data's 18-state DFA for
 * raw_tag == "script" (kernel/tokenizer.py:393-628): scans the script
 * body from `start`, returns 0 with *out_lt = position of the '<' of
 * the terminating "</script[ws|/|>]" (reached only from the DATA or
 * ESCAPED families — DOUBLE-escaped "</script>" switches back to
 * ESCAPED and stays body text), or *out_lt = -1 at EOF.  The Python
 * machine emits NO parse error in any of these states, so parity on
 * this path is purely positional: the body [start, lt) is one
 * CHARACTER token in both engines.  Returns -1 only on an internal
 * Python error from find_char. */
static int
script_end_scan(Scan *sc, Py_ssize_t start, Py_ssize_t *out_lt)
{
    enum {SD, SD_LT, SD_EO, SD_EN, ES, ES_D, ESC, ESC_D, ESC_DD,
          ESC_LT, ESC_EO, ESC_EN, DBS, DB, DB_D, DB_DD, DB_LT, DBE};
    static const char script6[6] = {'s', 'c', 'r', 'i', 'p', 't'};
    int ss = SD;
    Py_ssize_t n = sc->n, pos = start, lt = 0, tl = 0;
    Py_UCS4 tmp[16];

    while (pos < n) {
        Py_UCS4 c = RD(sc, pos);
        switch (ss) {
        case SD:
            if (c == '<') { lt = pos; ss = SD_LT; pos++; }
            else {
                Py_ssize_t nxt = find_char(sc, '<', pos);
                if (nxt == -2) return -1;
                pos = nxt < 0 ? n : nxt;
            }
            break;
        case SD_LT:
            if (c == '/') { ss = SD_EO; tl = 0; pos++; }
            else if (c == '!') { ss = ES; pos++; }
            else ss = SD;
            break;
        case SD_EO:
            if (is_alpha(c)) { ss = SD_EN; tl = 0; }
            else ss = SD;
            break;
        case SD_EN:
        case ESC_EN: {
            int back = (ss == SD_EN) ? SD : ESC;
            if (is_ws(c) || c == '/' || c == '>') {
                int match = (tl == 6);
                for (Py_ssize_t k = 0; match && k < 6; k++)
                    if (tmp[k] != (Py_UCS4)script6[k]) match = 0;
                if (match) { *out_lt = lt; return 0; }
                ss = back;
            } else if (is_alpha(c)) {
                if (tl < 15) {
                    Py_UCS4 t = c;
                    if (t >= 'A' && t <= 'Z') t += 32;
                    tmp[tl++] = t;
                    pos++;
                } else ss = back;
            } else ss = back;
            break; }
        case ES:
            if (c == '-') { ss = ES_D; pos++; }
            else ss = SD;
            break;
        case ES_D:
            if (c == '-') { ss = ESC_DD; pos++; }
            else ss = SD;
            break;
        case ESC:
            if (c == '-') { ss = ESC_D; pos++; }
            else if (c == '<') { lt = pos; ss = ESC_LT; pos++; }
            else pos++;
            break;
        case ESC_D:
            if (c == '-') { ss = ESC_DD; pos++; }
            else if (c == '<') { lt = pos; ss = ESC_LT; pos++; }
            else { ss = ESC; pos++; }
            break;
        case ESC_DD:
            if (c == '-') pos++;
            else if (c == '<') { lt = pos; ss = ESC_LT; pos++; }
            else if (c == '>') { ss = SD; pos++; }
            else { ss = ESC; pos++; }
            break;
        case ESC_LT:
            if (c == '/') { ss = ESC_EO; tl = 0; pos++; }
            else if (is_alpha(c)) { ss = DBS; tl = 0; }
            else ss = ESC;
            break;
        case ESC_EO:
            if (is_alpha(c)) { ss = ESC_EN; tl = 0; }
            else ss = ESC;
            break;
        case DBS:
        case DBE: {
            int here = ss;
            if (is_ws(c) || c == '/' || c == '>') {
                int match = (tl == 6);
                for (Py_ssize_t k = 0; match && k < 6; k++)
                    if (tmp[k] != (Py_UCS4)script6[k]) match = 0;
                if (here == DBS) ss = match ? DB : ESC;
                else ss = match ? ESC : DB;
                pos++;
            } else if (is_alpha(c)) {
                if (tl < 15) {
                    Py_UCS4 t = c;
                    if (t >= 'A' && t <= 'Z') t += 32;
                    tmp[tl++] = t;
                    pos++;
                } else ss = (here == DBS) ? ESC : DB;
            } else ss = (here == DBS) ? ESC : DB;
            break; }
        case DB:
            if (c == '-') { ss = DB_D; pos++; }
            else if (c == '<') { ss = DB_LT; pos++; }
            else pos++;
            break;
        case DB_D:
            if (c == '-') { ss = DB_DD; pos++; }
            else if (c == '<') { ss = DB_LT; pos++; }
            else { ss = DB; pos++; }
            break;
        case DB_DD:
            if (c == '-') pos++;
            else if (c == '<') { ss = DB_LT; pos++; }
            else if (c == '>') { ss = SD; pos++; }
            else { ss = DB; pos++; }
            break;
        default: /* DB_LT */
            if (c == '/') { ss = DBE; tl = 0; pos++; }
            else ss = DB;
            break;
        }
    }
    *out_lt = -1;  /* EOF inside script data */
    return 0;
}

static PyObject *substr(Scan *sc, Py_ssize_t a, Py_ssize_t b);

/* --- positioned parse errors (tokenizer._error mirror) ------------- */

static int
push_skip(Scan *sc, Py_ssize_t a, Py_ssize_t b)
{
    if (sc->n_skips == sc->cap_skips) {
        Py_ssize_t nc = sc->cap_skips ? sc->cap_skips * 2 : 8;
        SkipRange *ns = PyMem_Realloc(sc->skips, nc * sizeof(SkipRange));
        if (!ns) { PyErr_NoMemory(); return -1; }
        sc->skips = ns;
        sc->cap_skips = nc;
    }
    sc->skips[sc->n_skips].a = a;
    sc->skips[sc->n_skips].b = b;
    sc->n_skips++;
    return 0;
}

/* advance (line, col) over [from, to): +1 col per UTF-8 BYTE, '\n'
   resets col to 1 (tokenizer._bump_line_col / reference advance()).
   Surrogates cannot appear (scan_all prechecks bail on them). */
static void
lc_bump(Scan *sc, Py_ssize_t from, Py_ssize_t to, long *line, long *col)
{
    for (Py_ssize_t k = from; k < to; k++) {
        Py_UCS4 c = RD(sc, k);
        if (c == '\n') { (*line)++; *col = 1; }
        else *col += (c < 0x80) ? 1 : (c < 0x800) ? 2
                     : (c < 0x10000) ? 3 : 4;
    }
}

/* tokenizer._line_col: line/col of `pos` counting only bytes outside
   the skipped ranges, resuming from the incremental cursor. */
static void
line_col(Scan *sc, Py_ssize_t pos, long *lp, long *cp)
{
    Py_ssize_t cur = sc->lc_pos, si = sc->lc_skip;
    long line = sc->lc_line, col = sc->lc_col;
    if (pos < cur) { cur = 0; line = 1; col = 1; si = 0; }
    while (si < sc->n_skips) {
        Py_ssize_t a = sc->skips[si].a, b = sc->skips[si].b;
        if (a >= pos) break;
        Py_ssize_t stop = a > cur ? a : cur;
        lc_bump(sc, cur, stop < pos ? stop : pos, &line, &col);
        Py_ssize_t nb = b < pos ? b : pos;
        if (nb > cur) cur = nb;
        if (b > pos) break;
        si++;
    }
    lc_bump(sc, cur, pos, &line, &col);
    sc->lc_pos = pos;
    sc->lc_line = line;
    sc->lc_col = col;
    sc->lc_skip = si;
    *lp = line;
    *cp = col;
}

/* "line=N col=M: msg" onto pending_errs — surfaces when the record
   being assembled is PULLED, i.e. at the same point in the combined
   error stream where the Python machine appends it (production time,
   before the builder processes the token). */
static int
scan_error(Scan *sc, const char *msg, Py_ssize_t pos)
{
    long line, col;
    line_col(sc, pos, &line, &col);
    PyObject *s = PyUnicode_FromFormat("line=%ld col=%ld: %s",
                                       line, col, msg);
    if (!s) return -1;
    if (sc->pending_errs == NULL) {
        sc->pending_errs = PyList_New(0);
        if (!sc->pending_errs) { Py_DECREF(s); return -1; }
    }
    int rc = PyList_Append(sc->pending_errs, s);
    Py_DECREF(s);
    return rc;
}

static int emit(Scan *sc, unsigned char type, PyObject *name,
                PyObject *data, PyObject *attrs, unsigned char self_closing,
                unsigned char state_after);
static int emit_fq(Scan *sc, unsigned char type, PyObject *name,
                   PyObject *data, PyObject *attrs,
                   unsigned char self_closing, unsigned char state_after,
                   unsigned char force_quirks);

/* growable UCS4 accumulation buffer (comment-machine data assembly) */
typedef struct { Py_UCS4 *p; Py_ssize_t n, cap; } U4Buf;

static int
u4_put(U4Buf *b, Py_UCS4 c)
{
    if (b->n == b->cap) {
        Py_ssize_t nc = b->cap ? b->cap * 2 : 64;
        Py_UCS4 *np = PyMem_Realloc(b->p, nc * sizeof(Py_UCS4));
        if (!np) { PyErr_NoMemory(); return -1; }
        b->p = np;
        b->cap = nc;
    }
    b->p[b->n++] = c;
    return 0;
}

static int
u4_put_range(U4Buf *b, Scan *sc, Py_ssize_t a, Py_ssize_t e)
{
    for (Py_ssize_t k = a; k < e; k++)
        if (u4_put(b, RD(sc, k)) < 0) return -1;
    return 0;
}

static int
u4_put_ascii(U4Buf *b, const char *s)
{
    for (; *s; s++)
        if (u4_put(b, (Py_UCS4)*s) < 0) return -1;
    return 0;
}

/* Exact mirror of tokenizer._parse_comment's 10-state machine
 * (src/tokenizer.c:810-1018) INCLUDING its error emissions — the
 * error-free comment shape stays on the zero-copy first-"-->" fast
 * path in scan_all; this runs only when that path detects an error
 * shape (abrupt close, EOF, "--!>", nested "<!--").  Returns 0 ok
 * (comment record emitted, *io past the close), -1 python error. */
static int
parse_comment_full(Scan *sc, Py_ssize_t *io)
{
    enum {CS_START, CS_START_DASH, CS_COMMENT, CS_LT, CS_LT_BANG,
          CS_LT_BANG_DASH, CS_LT_BANG_DASH_DASH, CS_END_DASH, CS_END,
          CS_END_BANG};
    Py_ssize_t pos = *io + 4, n = sc->n;   /* past "<!--" */
    int state = CS_START;
    U4Buf d = {0};
#define CERR(m) do { if (scan_error(sc, (m), pos) < 0) goto fail; } \
                while (0)
#define CPUT(ch) do { if (u4_put(&d, (ch)) < 0) goto fail; } while (0)
#define CPUTS(s) do { if (u4_put_ascii(&d, (s)) < 0) goto fail; } while (0)

    while (pos <= n) {
        Py_UCS4 c = (pos < n) ? RD(sc, pos) : 0;   /* _peek -> "\0" */
        switch (state) {
        case CS_START:
            if (c == '-') { state = CS_START_DASH; pos++; }
            else if (c == '>') {
                CERR("abrupt-closing-of-empty-comment");
                pos++;
                goto close;
            } else if (c == 0) { CERR("eof-in-comment"); goto close; }
            else state = CS_COMMENT;
            break;
        case CS_START_DASH:
            if (c == '-') { state = CS_END; pos++; }
            else if (c == '>') {
                CERR("abrupt-closing-of-empty-comment");
                pos++;
                goto close;
            } else if (c == 0) {
                CERR("eof-in-comment");
                CPUT('-');
                goto close;
            } else { CPUT('-'); state = CS_COMMENT; }
            break;
        case CS_COMMENT:
            if (c == '<') { CPUT(c); state = CS_LT; pos++; }
            else if (c == '-') { state = CS_END_DASH; pos++; }
            else if (c == 0) { CERR("eof-in-comment"); goto close; }
            else {
                /* bulk-consume plain chars (fast path parity) */
                Py_ssize_t q = pos;
                while (q < n) {
                    Py_UCS4 qc = RD(sc, q);
                    if (qc == '<' || qc == '-') break;
                    q++;
                }
                if (u4_put_range(&d, sc, pos, q) < 0) goto fail;
                pos = q;
            }
            break;
        case CS_LT:
            if (c == '!') { CPUT(c); state = CS_LT_BANG; pos++; }
            else if (c == '<') { CPUT(c); pos++; }
            else state = CS_COMMENT;
            break;
        case CS_LT_BANG:
            if (c == '-') { state = CS_LT_BANG_DASH; pos++; }
            else state = CS_COMMENT;
            break;
        case CS_LT_BANG_DASH:
            if (c == '-') { state = CS_LT_BANG_DASH_DASH; pos++; }
            else state = CS_END_DASH;
            break;
        case CS_LT_BANG_DASH_DASH:
            if (c == '>' || c == 0) state = CS_END;
            else { CERR("nested-comment"); state = CS_END; }
            break;
        case CS_END_DASH:
            if (c == '-') { state = CS_END; pos++; }
            else if (c == 0) {
                CERR("eof-in-comment");
                CPUT('-');
                goto close;
            } else { CPUT('-'); state = CS_COMMENT; }
            break;
        case CS_END:
            if (c == '>') { pos++; goto close; }
            else if (c == '!') { state = CS_END_BANG; pos++; }
            else if (c == '-') { CPUT('-'); pos++; }
            else if (c == 0) {
                CERR("eof-in-comment");
                CPUTS("--");
                goto close;
            } else { CPUTS("--"); state = CS_COMMENT; }
            break;
        default:  /* CS_END_BANG */
            if (c == '-') { CPUTS("--!"); state = CS_END_DASH; pos++; }
            else if (c == '>') {
                CERR("incorrectly-closed-comment");
                pos++;
                goto close;
            } else if (c == 0) {
                CERR("eof-in-comment");
                CPUTS("--!");
                goto close;
            } else { CPUTS("--!"); state = CS_COMMENT; }
            break;
        }
    }
close: ;
    PyObject *data = PyUnicode_FromKindAndData(PyUnicode_4BYTE_KIND,
                                               d.p ? (void *)d.p : (void *)&d,
                                               d.n);
    PyMem_Free(d.p);
    if (!data) return -1;
    if (emit(sc, T_COMMENT, NULL, data, NULL, 0, S_DATA) < 0) return -1;
    *io = pos;
    return 0;
fail:
    PyMem_Free(d.p);
    return -1;
#undef CERR
#undef CPUT
#undef CPUTS
}

/* Text of a charref-PROCESSING region [a,e) (data run, RCDATA body,
 * attribute value).  Ampersand-free or literal-only regions return the
 * plain substring (the common case, no Python call).  A region with a
 * charref ATTEMPT is handed to the Python kernel's own
 * decode_character_references — the exact function the tokenizer
 * runs — so the decoded text and any error strings are identical by
 * construction (the kernel's charref errors carry no position info,
 * which is what makes this composable with the no-positioned-errors
 * subset).  Decode errors accumulate on sc->pending_errs and ride the
 * NEXT emitted token (the one this region belongs to).
 * Returns 0 ok (*out owned), 1 bail, -1 python error. */
static int
region_text(Scan *sc, Py_ssize_t a, Py_ssize_t e, int in_attr,
            PyObject **out)
{
    if (amp_region_ok(sc, a, e)) {
        *out = substr(sc, a, e);
        return *out ? 0 : -1;
    }
    if (!sc->decode_fn) { sc->bail = "charref-attempt"; return 1; }
    PyObject *raw = substr(sc, a, e);
    if (!raw) return -1;
    PyObject *errs = PyList_New(0);
    if (!errs) { Py_DECREF(raw); return -1; }
    PyObject *dec = PyObject_CallFunctionObjArgs(
        sc->decode_fn, raw, in_attr ? Py_True : Py_False, errs, NULL);
    Py_DECREF(raw);
    if (!dec) { Py_DECREF(errs); return -1; }
    if (!PyUnicode_Check(dec)) {
        Py_DECREF(dec); Py_DECREF(errs);
        PyErr_SetString(PyExc_TypeError, "decode_fn must return str");
        return -1;
    }
    if (PyList_GET_SIZE(errs) > 0) {
        if (sc->pending_errs == NULL) {
            sc->pending_errs = errs;
            errs = NULL;
        } else if (PyList_SetSlice(
                       sc->pending_errs,
                       PyList_GET_SIZE(sc->pending_errs),
                       PyList_GET_SIZE(sc->pending_errs), errs) < 0) {
            Py_DECREF(dec); Py_DECREF(errs);
            return -1;
        }
    }
    Py_XDECREF(errs);
    *out = dec;
    return 0;
}

/* substring [a,b) */
static PyObject *
substr(Scan *sc, Py_ssize_t a, Py_ssize_t b)
{
    return PyUnicode_Substring(sc->text, a, b);
}

/* ascii-lowered substring [a,b); lowers only A-Z (ascii_lower parity) */
static PyObject *
lower_substr(Scan *sc, Py_ssize_t a, Py_ssize_t b)
{
    int has_upper = 0;
    Py_UCS4 maxc = 0;
    for (Py_ssize_t i = a; i < b; i++) {
        Py_UCS4 c = RD(sc, i);
        if (c >= 'A' && c <= 'Z') has_upper = 1;
        if (c > maxc) maxc = c;
    }
    if (!has_upper)
        return substr(sc, a, b);
    PyObject *s = PyUnicode_New(b - a, maxc);
    if (!s) return NULL;
    int k = PyUnicode_KIND(s);
    void *d = PyUnicode_DATA(s);
    for (Py_ssize_t i = a; i < b; i++) {
        Py_UCS4 c = RD(sc, i);
        if (c >= 'A' && c <= 'Z') c += 32;
        PyUnicode_WRITE(k, d, i - a, c);
    }
    return s;
}

/* dedup name strings through a self-keyed dict */
static PyObject *
intern_name(Scan *sc, PyObject *s)
{
    if (!s) return NULL;
    PyObject *got = PyDict_SetDefault(sc->interns, s, s);
    if (!got) { Py_DECREF(s); return NULL; }
    Py_INCREF(got);
    Py_DECREF(s);
    return got;
}

static int
emit_fq(Scan *sc, unsigned char type, PyObject *name, PyObject *data,
        PyObject *attrs, unsigned char self_closing,
        unsigned char state_after, unsigned char force_quirks)
{
    TokRec r = {type, self_closing, state_after, force_quirks,
                name, data, attrs, sc->pending_errs};
    sc->pending_errs = NULL;        /* stolen into the record */
    if (recbuf_push(&sc->rb, r) < 0) {
        Py_XDECREF(name); Py_XDECREF(data); Py_XDECREF(attrs);
        Py_XDECREF(r.errs);
        return -1;
    }
    return 0;
}

static int
emit(Scan *sc, unsigned char type, PyObject *name, PyObject *data,
     PyObject *attrs, unsigned char self_closing, unsigned char state_after)
{
    return emit_fq(sc, type, name, data, attrs, self_closing,
                   state_after, 0);
}

#define BAIL(sc, why) do { (sc)->bail = (why); return 1; } while (0)

/* raw-tag table: name -> state (title/textarea RCDATA, script, RAWTEXT
   set).  Compared against the LOWERED tag name. */
static int
raw_state_for(PyObject *lowered_name)
{
    const char *names[] = {"title", "textarea", "script", "style", "xmp",
                           "iframe", "noembed", "noframes", NULL};
    const int states[] = {S_RCDATA, S_RCDATA, S_SCRIPT, S_RAWTEXT,
                          S_RAWTEXT, S_RAWTEXT, S_RAWTEXT, S_RAWTEXT};
    for (int k = 0; names[k]; k++) {
        if (PyUnicode_CompareWithASCIIString(lowered_name, names[k]) == 0)
            return states[k];
    }
    return S_DATA;
}

static int
name_equals(PyObject *lowered_name, const char *s)
{
    return PyUnicode_CompareWithASCIIString(lowered_name, s) == 0;
}

/* ci-compare text[i..) against an ASCII-lower literal of length m */
static int
ci_match(Scan *sc, Py_ssize_t i, const char *lit, Py_ssize_t m)
{
    if (i + m > sc->n) return 0;
    for (Py_ssize_t k = 0; k < m; k++) {
        Py_UCS4 c = RD(sc, i + k);
        if (c >= 'A' && c <= 'Z') c += 32;
        if (c != (Py_UCS4)(unsigned char)lit[k]) return 0;
    }
    return 1;
}

/* append (name, value) to attrs, dropping duplicates (_append_attr) */
static int
attrs_append(PyObject *attrs, PyObject *name, PyObject *value)
{
    Py_ssize_t m = PyList_GET_SIZE(attrs);
    for (Py_ssize_t k = 0; k < m; k++) {
        PyObject *pair = PyList_GET_ITEM(attrs, k);
        int eq = PyObject_RichCompareBool(PyTuple_GET_ITEM(pair, 0),
                                          name, Py_EQ);
        if (eq < 0) { Py_DECREF(name); Py_DECREF(value); return -1; }
        if (eq) { Py_DECREF(name); Py_DECREF(value); return 0; }
    }
    PyObject *t = PyTuple_Pack(2, name, value);
    Py_DECREF(name);
    Py_DECREF(value);
    if (!t) return -1;
    int rc = PyList_Append(attrs, t);
    Py_DECREF(t);
    return rc;
}

/* attr-name accumulation buffer (AFTER_ATTR_NAME no-reset quirk means
   names can span non-contiguous runs) */
#define NAMEBUF_MAX 256
typedef struct {
    Py_UCS4 buf[NAMEBUF_MAX];
    Py_ssize_t len;
    int overflow;
} NameBuf;

static void nb_reset(NameBuf *nb) { nb->len = 0; nb->overflow = 0; }

static void
nb_append_lower(Scan *sc, NameBuf *nb, Py_ssize_t a, Py_ssize_t b)
{
    for (Py_ssize_t i = a; i < b; i++) {
        if (nb->len >= NAMEBUF_MAX) { nb->overflow = 1; return; }
        Py_UCS4 c = RD(sc, i);
        if (c >= 'A' && c <= 'Z') c += 32;
        nb->buf[nb->len++] = c;
    }
}

static PyObject *
nb_to_str(NameBuf *nb)
{
    return PyUnicode_FromKindAndData(PyUnicode_4BYTE_KIND, nb->buf, nb->len);
}

/* per-BYTE "unexpected character in attribute name" errors with a
   FROZEN (line, col) per char: the C reference validates byte by
   byte, advance() running once per byte between reports
   (tokenizer.py ST_ATTR_NAME, src/tokenizer.c:1236-1238) */
static int
bad_name_char_errors(Scan *sc, Py_ssize_t pos, Py_UCS4 c)
{
    long line, col;
    line_col(sc, pos, &line, &col);
    int nby = (c < 0x80) ? 1 : (c < 0x800) ? 2 : (c < 0x10000) ? 3 : 4;
    for (int k = 0; k < nby; k++) {
        PyObject *es = PyUnicode_FromFormat(
            "line=%ld col=%ld: unexpected character in attribute name",
            line, col + k);
        if (!es) return -1;
        if (sc->pending_errs == NULL) {
            sc->pending_errs = PyList_New(0);
            if (!sc->pending_errs) { Py_DECREF(es); return -1; }
        }
        if (PyList_Append(sc->pending_errs, es) < 0) {
            Py_DECREF(es);
            return -1;
        }
        Py_DECREF(es);
    }
    return 0;
}

/* --- start tag parser ---------------------------------------------- */
/* returns 0 ok, 1 bail, -1 error.  *out_i advanced past '>'.          */

enum { ST_BEFORE_NAME_ /*unused*/, ST_TAG_NAME, ST_BEFORE_ATTR, ST_ATTR_NAME,
       ST_AFTER_ATTR_NAME, ST_BEFORE_VALUE, ST_DQ, ST_SQ, ST_UQ, ST_SELF };

static int
parse_start_tag(Scan *sc, Py_ssize_t *io)
{
    Py_ssize_t i = *io + 1;        /* past '<'; caller verified alpha */
    Py_ssize_t n = sc->n;

    /* tag name: single run, stop set { WS, '/', '>' } (no NULs in the
       accepted subset) */
    Py_ssize_t a = i;
    while (i < n) {
        Py_UCS4 c = RD(sc, i);
        if (is_ws(c) || c == '/' || c == '>') break;
        i++;
    }
    PyObject *name = intern_name(sc, lower_substr(sc, a, i));
    if (!name) return -1;

    PyObject *attrs = NULL;
    unsigned char self_closing = 0;
    if (i >= n)         /* "<div" + EOF: token emitted, NO error
                           (ST_TAG_NAME breaks on "\0") */
        goto done;
    NameBuf nb;
    nb_reset(&nb);
    int state = ST_BEFORE_ATTR;     /* entered on WS; '/' and '>' handled */

    Py_UCS4 c = RD(sc, i);
    if (c == '>') {
        i++;
        goto done;
    }
    if (c == '/') {
        state = ST_SELF;
        i++;
    } else {
        i++;                        /* consume the WS */
    }

    attrs = PyList_New(0);
    if (!attrs) { Py_DECREF(name); return -1; }

#define SBAIL(why) do { Py_DECREF(name); Py_XDECREF(attrs); \
                        sc->bail = (why); return 1; } while (0)
#define SERR() do { Py_DECREF(name); Py_XDECREF(attrs); return -1; } while (0)

    while (1) {
        c = (i < n) ? RD(sc, i) : 0;   /* _peek: "\0" at EOF */
        switch (state) {
        case ST_BEFORE_ATTR:
            if (c == 0) { nb_reset(&nb); state = ST_ATTR_NAME; }
            else if (is_ws(c)) { i++; }
            else if (c == '/') { state = ST_SELF; i++; }
            else if (c == '>') { i++; goto done; }
            else if (c == '=') {
                /* recoverable: error, consume, stay (tokenizer
                   ST_BEFORE_ATTR_NAME '=') */
                if (scan_error(sc,
                        "attribute name missing before '='", i) < 0)
                    SERR();
                i++;
            }
            else { nb_reset(&nb); state = ST_ATTR_NAME; }
            break;
        case ST_ATTR_NAME: {
            if (c != 0) {
                if (is_ws(c)) { state = ST_AFTER_ATTR_NAME; i++; break; }
                if (c == '=') { state = ST_BEFORE_VALUE; i++; break; }
            }
            if (c == '/' || c == '>' || c == 0) {
                PyObject *an = nb_to_str(&nb);
                if (!an) SERR();
                an = intern_name(sc, an);
                if (!an) SERR();
                PyObject *ev = PyUnicode_FromStringAndSize("", 0);
                if (!ev) { Py_DECREF(an); SERR(); }
                if (attrs_append(attrs, an, ev) < 0) SERR();
                if (c == '/') { state = ST_SELF; i++; }
                else if (c == '>') { i++; goto done; }
                else goto done;           /* EOF: token still emitted */
                break;
            }
            /* name run: stop set { WS, '=', '/', '>' }; bad chars
               ([^0-9A-Za-z\-_:]) are kept in the (lowered) name and
               error once per UTF-8 byte */
            Py_ssize_t ra = i;
            while (i < n) {
                Py_UCS4 rc_ = RD(sc, i);
                if (is_ws(rc_) || rc_ == '=' || rc_ == '/' || rc_ == '>')
                    break;
                if (!attr_name_ok(rc_)
                    && bad_name_char_errors(sc, i, rc_) < 0)
                    SERR();
                i++;
            }
            nb_append_lower(sc, &nb, ra, i);
            if (nb.overflow) SBAIL("attr-name-too-long");
            break;
        }
        case ST_AFTER_ATTR_NAME:
            if (c != 0 && is_ws(c)) { i++; }
            else if (c == '=') { state = ST_BEFORE_VALUE; i++; }
            else if (c == '>' || c == '/' || c == 0) {
                PyObject *an = nb_to_str(&nb);
                if (!an) SERR();
                an = intern_name(sc, an);
                if (!an) SERR();
                PyObject *ev = PyUnicode_FromStringAndSize("", 0);
                if (!ev) { Py_DECREF(an); SERR(); }
                if (attrs_append(attrs, an, ev) < 0) SERR();
                if (c == '/') { state = ST_SELF; i++; }
                else if (c == '>') { i++; goto done; }
                else goto done;   /* EOF: Python re-enters ATTR_NAME,
                                     re-appends (duplicate-dropped),
                                     then breaks — net effect equal */
            } else {
                /* no-reset quirk: emit current name valueless, keep
                   accumulating into the SAME buffer */
                PyObject *an = nb_to_str(&nb);
                if (!an) SERR();
                an = intern_name(sc, an);
                if (!an) SERR();
                PyObject *ev = PyUnicode_FromStringAndSize("", 0);
                if (!ev) { Py_DECREF(an); SERR(); }
                if (attrs_append(attrs, an, ev) < 0) SERR();
                state = ST_ATTR_NAME;
            }
            break;
        case ST_BEFORE_VALUE:
            if (c == 0) goto done;   /* -> UQ -> "\0" break, NO attr */
            else if (is_ws(c)) { i++; }
            else if (c == '"') { state = ST_DQ; i++; }
            else if (c == '\'') { state = ST_SQ; i++; }
            else if (c == '>') {
                if (scan_error(sc, "attribute value missing", i) < 0)
                    SERR();
                PyObject *an = nb_to_str(&nb);
                if (!an) SERR();
                an = intern_name(sc, an);
                if (!an) SERR();
                PyObject *ev = PyUnicode_FromStringAndSize("", 0);
                if (!ev) { Py_DECREF(an); SERR(); }
                if (attrs_append(attrs, an, ev) < 0) SERR();
                i++;
                goto done;
            }
            else state = ST_UQ;
            break;
        case ST_DQ: case ST_SQ: {
            Py_UCS4 q = (state == ST_DQ) ? '"' : '\'';
            Py_ssize_t e = find_char(sc, q, i);
            if (e == -2) SERR();
            if (e < 0) {            /* unclosed: bulk-consume to EOF,
                                       then "\0" breaks — attr dropped,
                                       value NEVER decoded */
                i = n;
                goto done;
            }
            PyObject *v;
            int rr = region_text(sc, i, e, 1, &v);
            if (rr < 0) SERR();
            if (rr) SBAIL(sc->bail);
            PyObject *an = nb_to_str(&nb);
            if (!an) { Py_DECREF(v); SERR(); }
            an = intern_name(sc, an);
            if (!an) { Py_DECREF(v); SERR(); }
            if (attrs_append(attrs, an, v) < 0) SERR();
            i = e + 1;
            state = ST_BEFORE_ATTR;
            break;
        }
        case ST_UQ: {
            Py_ssize_t va = i;
            while (i < n) {
                Py_UCS4 uc = RD(sc, i);
                if (is_ws(uc) || uc == '>') break;
                i++;
            }
            if (i >= n) goto done;  /* "\0" breaks, attr dropped */
            PyObject *v;
            int rr = region_text(sc, va, i, 1, &v);
            if (rr < 0) SERR();
            if (rr) SBAIL(sc->bail);
            PyObject *an = nb_to_str(&nb);
            if (!an) { Py_DECREF(v); SERR(); }
            an = intern_name(sc, an);
            if (!an) { Py_DECREF(v); SERR(); }
            if (attrs_append(attrs, an, v) < 0) SERR();
            c = RD(sc, i);
            if (c == '>') { i++; goto done; }
            i++;  /* WS */
            state = ST_BEFORE_ATTR;
            break;
        }
        case ST_SELF:
            if (c == '>') { self_closing = 1; i++; goto done; }
            /* "unexpected '/' in start tag" at the char AFTER the
               slash (or EOF); the tag ends HERE without consuming it
               — the rest re-scans as data (tokenizer ST_SELF_CLOSING
               else-branch: error + break) */
            if (scan_error(sc, "unexpected '/' in start tag", i) < 0)
                SERR();
            goto done;
        }
    }

done: ;
    /* PLAINTEXT is a tokenizer-LEVEL switch (_enter_raw_for, no
       builder feedback): the rest of the input is ONE character token
       — no charrefs, no errors, no tags — and the only builder write
       to tz.state (the SVG-<title> undo) needs a later title START
       token, which cannot exist after plaintext.  state 6 == the
       Python machine's PLAINTEXT. */
    if (name_equals(name, "plaintext")) {
        if (emit(sc, T_START, name, NULL, attrs, self_closing, 6) < 0)
            return -1;
        if (sc->n > i) {
            PyObject *d = substr(sc, i, sc->n);
            if (!d) return -1;
            if (emit(sc, T_CHAR, NULL, d, NULL, 0, 6) < 0) return -1;
        }
        *io = sc->n;
        return 0;
    }
    /* Foreign content (<svg>/<math>) is builder-side EXCEPT for two
       feedback channels, both gated on specific later input: the
       builder's SVG-<title> tokenizer undo (foreign.py) and the
       foreign-gated CDATA flag (allow_cdata).  CDATA needs "<![",
       which always bails via the bogus-comment path; the undo (and
       every other raw-entry ambiguity — e.g. <style> inside svg vs
       inside an HTML integration point, breakout <font color>, a
       <title> after </svg>) needs a raw-state trigger START tag at
       some tag position after the first foreign tag.  So: accept the
       foreign tag itself as a plain DATA-state token and set a STICKY
       flag; from then on any raw-trigger start tag bails the whole
       document.  Conservative (a plain-HTML <title> after </svg>
       also bails) but context-free and provably token-identical:
       before the flag nothing changed, after the flag no raw state is
       ever entered C-side, matching every builder-feedback scenario
       by never reaching one. */
    if (name_equals(name, "svg") || name_equals(name, "math"))
        sc->seen_foreign = 1;
    int rstate = raw_state_for(name);
    if (rstate != S_DATA && sc->seen_foreign) {
        Py_DECREF(name); Py_XDECREF(attrs);
        BAIL(sc, "raw-tag-after-foreign");
    }
    if (emit(sc, T_START, name, NULL, attrs, self_closing,
             (unsigned char)rstate) < 0)
        return -1;
    *io = i;

    if (rstate != S_DATA) {
        /* raw content scan — entered regardless of self_closing, like
           _enter_raw_for.  Emits the body (if nonempty) as ONE token,
           leaving *io at the '<' of the matching end tag (the main
           loop then parses it as a normal end tag). */
        PyObject *lname = name;  /* borrowed via recs (still alive) */
        Py_ssize_t start = i;
        if (rstate == S_SCRIPT) {
            /* full escaped/double-escaped DFA (exact mirror of the
               Python machine, no error states) — "</script>" inside
               a DOUBLE-escaped region stays body text and the body
               ends at the DATA/ESCAPED-family terminator only */
            Py_ssize_t lt;
            if (script_end_scan(sc, start, &lt) < 0) return -1;
            if (lt < 0) {
                /* EOF in script data: emit remainder, back to DATA */
                if (sc->n > start) {
                    /* raw tz->pos++ scan, no advance() (positions of
                       later errors are stale over it, tokenizer:620) */
                    if (push_skip(sc, start, sc->n) < 0) return -1;
                    PyObject *d = substr(sc, start, sc->n);
                    if (!d) return -1;
                    if (emit(sc, T_CHAR, NULL, d, NULL, 0, S_DATA) < 0)
                        return -1;
                }
                *io = sc->n;
                return 0;
            }
            if (lt > start) {
                if (push_skip(sc, start, lt) < 0) return -1;
                PyObject *d = substr(sc, start, lt);
                if (!d) return -1;
                if (emit(sc, T_CHAR, NULL, d, NULL, 0, S_DATA) < 0)
                    return -1;
            }
            *io = lt;
            return 0;
        }
        while (1) {
            Py_ssize_t lt = find_char(sc, '<', i);
            if (lt == -2) return -1;
            if (lt < 0) {
                /* EOF in raw state: emit remainder, back to DATA */
                if (sc->n > start) {
                    /* raw tz->pos++ scan, no advance() (tokenizer:380) */
                    if (push_skip(sc, start, sc->n) < 0) return -1;
                    /* RCDATA (title/textarea) processes charrefs;
                       RAWTEXT never does, '&' stays literal */
                    PyObject *d;
                    if (rstate == S_RCDATA) {
                        int rr = region_text(sc, start, sc->n, 0, &d);
                        if (rr) return rr;
                    } else {
                        d = substr(sc, start, sc->n);
                        if (!d) return -1;
                    }
                    if (emit(sc, T_CHAR, NULL, d, NULL, 0, S_DATA) < 0)
                        return -1;
                }
                *io = sc->n;
                return 0;
            }
            if (lt + 1 >= sc->n) { i = lt + 1; continue; }
            Py_UCS4 c2 = RD(sc, lt + 1);
            if (c2 != '/') {
                i = lt + 1;
                continue;
            }
            /* accumulate alpha run (cap 15), compare lowered name */
            Py_ssize_t p = lt + 2, tl = 0;
            Py_UCS4 tmp[16];
            while (p < sc->n && is_alpha(RD(sc, p)) && tl < 15) {
                Py_UCS4 tc = RD(sc, p);
                if (tc >= 'A' && tc <= 'Z') tc += 32;
                tmp[tl++] = tc;
                p++;
            }
            if (p >= sc->n) { i = lt + 2; continue; }  /* EOF later */
            Py_UCS4 term = RD(sc, p);
            if (tl == 15 && is_alpha(term)) { i = p; continue; }
            if (!(is_ws(term) || term == '/' || term == '>')) {
                i = p; continue;
            }
            /* terminator reached: compare to raw tag */
            Py_ssize_t want = PyUnicode_GET_LENGTH(lname);
            int match = (tl == want);
            if (match) {
                for (Py_ssize_t k = 0; k < tl; k++) {
                    if (PyUnicode_READ_CHAR(lname, k) != tmp[k]) {
                        match = 0; break;
                    }
                }
            }
            if (!match) { i = p; continue; }
            if (lt > start) {
                /* raw tz->pos++ scan, no advance() (tokenizer:356) */
                if (push_skip(sc, start, lt) < 0) return -1;
                PyObject *d;
                if (rstate == S_RCDATA) {
                    int rr = region_text(sc, start, lt, 0, &d);
                    if (rr) return rr;
                } else {
                    d = substr(sc, start, lt);
                    if (!d) return -1;
                }
                if (emit(sc, T_CHAR, NULL, d, NULL, 0, S_DATA) < 0)
                    return -1;
            }
            *io = lt;
            return 0;
        }
    }
    return 0;
#undef SBAIL
#undef SERR
}

/* --- whole-document scan ------------------------------------------- */
/* returns 0 ok, 1 bail, -1 python error                               */

static int
scan_all(Scan *sc)
{
    Py_ssize_t i = 0, n = sc->n;

    /* global pre-checks: NUL, surrogates (surrogateescape byte
       fusion).  One pass, then the main scan never needs to re-check.
       NOT global:
       - '&': literal ampersands are accepted per-region and charref
         attempts are delegated to the kernel's decoder (region_text);
       - '\r': this kernel preserves CR verbatim in token data (no
         CRLF normalization — reference deviation) and treats it as
         whitespace in every tag-machine state exactly like is_ws()
         here; the CR paths that ERROR in the Python machine
         (\r before '>' in end tags, after '/') already end in bails
         because they break the immediate-'>' / self-closing shape. */
    for (Py_ssize_t k = 0; k < n; k++) {
        Py_UCS4 c = RD(sc, k);
        if (c == 0 || (c >= 0xD800 && c <= 0xDFFF))
            BAIL(sc, "precheck");
    }

    while (i < n) {
        Py_UCS4 c = RD(sc, i);
        if (c != '<') {
            Py_ssize_t lt = find_char(sc, '<', i);
            if (lt == -2) return -1;
            Py_ssize_t e = (lt < 0) ? n : lt;
            PyObject *d;
            int rr = region_text(sc, i, e, 0, &d);
            if (rr) return rr;
            if (emit(sc, T_CHAR, NULL, d, NULL, 0, S_DATA) < 0) return -1;
            i = e;
            continue;
        }
        if (i + 1 >= n) {
            /* '<' at EOF: literal '<' character, no error */
            PyObject *d = PyUnicode_FromStringAndSize("<", 1);
            if (!d) return -1;
            if (emit(sc, T_CHAR, NULL, d, NULL, 0, S_DATA) < 0) return -1;
            i++;
            continue;
        }
        Py_UCS4 c1 = RD(sc, i + 1);
        if (c1 == '/') {
            if (i + 2 >= n || !is_alpha(RD(sc, i + 2))) {
                /* reference deviation (tokenizer next(), 1181-1190):
                   "invalid end tag" error at the '<', then a literal
                   '<' CHARACTER token; the '/' and what follows are
                   re-scanned as ordinary data */
                if (scan_error(sc, "invalid end tag", i) < 0) return -1;
                PyObject *d = PyUnicode_FromStringAndSize("<", 1);
                if (!d) return -1;
                if (emit(sc, T_CHAR, NULL, d, NULL, 0, S_DATA) < 0)
                    return -1;
                i++;
                continue;
            }
            /* name run [^ WS > /]* (_END_NAME_RUN), then:
               '>' -> clean close; EOF -> token, pos=n, NO error;
               anything else -> "end tag has trailing garbage/
               attributes" at the first garbage char, silent skip to
               after the next '>' (tokenizer._parse_end_tag) */
            Py_ssize_t a = i + 2, p = a;
            while (p < n) {
                Py_UCS4 ec = RD(sc, p);
                if (is_ws(ec) || ec == '>' || ec == '/') break;
                p++;
            }
            PyObject *nm = intern_name(sc, lower_substr(sc, a, p));
            if (!nm) return -1;
            if (p >= n) {
                if (emit(sc, T_END, nm, NULL, NULL, 0, S_DATA) < 0)
                    return -1;
                i = n;
                continue;
            }
            if (RD(sc, p) != '>') {
                if (scan_error(sc,
                        "end tag has trailing garbage/attributes",
                        p) < 0) {
                    Py_DECREF(nm);
                    return -1;
                }
                Py_ssize_t gt = find_char(sc, '>', p);
                if (gt == -2) { Py_DECREF(nm); return -1; }
                if (emit(sc, T_END, nm, NULL, NULL, 0, S_DATA) < 0)
                    return -1;
                i = (gt < 0) ? n : gt + 1;
                continue;
            }
            if (emit(sc, T_END, nm, NULL, NULL, 0, S_DATA) < 0) return -1;
            i = p + 1;
            continue;
        }
        if (c1 == '!') {
            if (i + 3 < n && RD(sc, i + 2) == '-' && RD(sc, i + 3) == '-') {
                /* comment: data is EXACTLY text[b:e) where e is the
                   FIRST "-->" occurrence, consumed through e+2.  Proof
                   sketch against _parse_comment's 10-state machine:
                   every consumed char is eventually appended to data
                   except the final "--" ">" — dash runs park in
                   COMMENT_END appending the extra dashes ("a---->" ->
                   "a--"), "--!" is appended by COMMENT_END_BANG on
                   '-', and the LT_BANG(_DASH*) chain either closes on
                   the straddled terminator ("...<!" + "-->", data
                   keeps "<!") or raises nested-comment.  The machine
                   can only CLOSE at a literal "-->" (COMMENT_END '>')
                   or at an ERROR shape, so on the error-free subset
                   the close point IS the first "-->".  Error shapes
                   (all -> parse_comment_full, the exact 10-state
                   mirror with positioned errors):
                     - abrupt close: <!--> / <!---> (START/START_DASH)
                     - no terminator: eof-in-comment
                     - "--!>" before e: incorrectly-closed-comment
                       (END_BANG '>'; its "--" is always literal, so
                       the substring test is exact — it cannot span
                       the terminator: that would need '!' where the
                       terminator has '-')
                     - "<!--" starting at k <= e-3: nested-comment
                       (LT_BANG_DASH_DASH next char is not '>': if
                       both dashes sit in the body, first-"-->" means
                       the next char is not '>'; if they straddle one
                       terminator dash, k = e-3, the next char is the
                       other dash).  k = e-2 — both dashes ARE the
                       terminator's — closes silently, accepted. */
                Py_ssize_t b = i + 4, e = -1;
                int hard = 0;   /* error shape -> full 10-state machine */
                if (b < n && RD(sc, b) == '>')
                    hard = 1;
                if (b + 1 < n && RD(sc, b) == '-' && RD(sc, b + 1) == '>')
                    hard = 1;
                if (!hard) {
                    for (Py_ssize_t k = b; k + 2 < n; k++) {
                        if (RD(sc, k) == '-' && RD(sc, k + 1) == '-'
                            && RD(sc, k + 2) == '>') { e = k; break; }
                    }
                    if (e < 0) hard = 1;
                }
                if (!hard) {
                    for (Py_ssize_t k = b; k + 3 < e; k++) {
                        if (RD(sc, k) == '-' && RD(sc, k + 1) == '-'
                            && RD(sc, k + 2) == '!' && RD(sc, k + 3) == '>')
                            { hard = 1; break; }
                    }
                    for (Py_ssize_t k = b; !hard && k + 3 <= e; k++) {
                        if (RD(sc, k) == '<' && RD(sc, k + 1) == '!'
                            && RD(sc, k + 2) == '-' && RD(sc, k + 3) == '-')
                            { hard = 1; break; }
                    }
                }
                if (hard) {
                    /* exact machine: positioned errors + reassembled
                       data (abrupt close, EOF, "--!>", nested) */
                    if (parse_comment_full(sc, &i) < 0) return -1;
                    continue;
                }
                PyObject *d = substr(sc, b, e);
                if (!d) return -1;
                if (emit(sc, T_COMMENT, NULL, d, NULL, 0, S_DATA) < 0)
                    return -1;
                i = e + 3;
                continue;
            }
            if (ci_match(sc, i, "<!doctype", 9)) {
                /* full _parse_doctype mirror INCLUDING its error
                   shapes: name missing, id quote missing, id closing
                   quote missing — each sets force_quirks and emits
                   the positioned error (pos = the machine's pos at
                   the _error call); an unclosed quote still captures
                   the partial id to EOF, lowered, like the Python
                   while-loop.  The PUBLIC second id's ABSENCE stays
                   silent.  Ids ride the DOCTYPE record's (data,
                   attrs) slots, which doctypes never use otherwise. */
                unsigned char fq = 0;
                Py_ssize_t p = i + 9;
                while (p < n && is_ws(RD(sc, p))) p++;
                Py_ssize_t a = p;
                while (p < n && !is_ws(RD(sc, p)) && RD(sc, p) != '>') p++;
                if (p == a) {
                    fq = 1;
                    if (scan_error(sc, "doctype name missing", p) < 0)
                        return -1;
                }
                PyObject *nm = intern_name(sc, lower_substr(sc, a, p));
                if (!nm) return -1;
                while (p < n && is_ws(RD(sc, p))) p++;
                PyObject *pub = NULL, *sysid = NULL;
                int kw_public = ci_match(sc, p, "public", 6);
                if (kw_public || ci_match(sc, p, "system", 6)) {
                    p += 6;
                    while (p < n && is_ws(RD(sc, p))) p++;
                    Py_UCS4 q = (p < n) ? RD(sc, p) : 0;
                    if (q != '"' && q != '\'') {
                        fq = 1;
                        if (scan_error(sc, kw_public
                                ? "doctype public id missing"
                                : "doctype system id missing", p) < 0) {
                            Py_DECREF(nm);
                            return -1;
                        }
                    } else {
                        p++;
                        Py_ssize_t e1 = find_char(sc, q, p);
                        if (e1 == -2) { Py_DECREF(nm); return -1; }
                        Py_ssize_t stop = (e1 < 0) ? n : e1;
                        PyObject *id1 = lower_substr(sc, p, stop);
                        if (!id1) { Py_DECREF(nm); return -1; }
                        if (e1 < 0) {
                            fq = 1;
                            if (scan_error(sc, kw_public
                                    ? "doctype public id missing "
                                      "closing quote"
                                    : "doctype system id missing "
                                      "closing quote", n) < 0) {
                                Py_DECREF(nm); Py_DECREF(id1);
                                return -1;
                            }
                            p = n;
                        } else {
                            p = e1 + 1;
                        }
                        if (kw_public) {
                            pub = id1;
                            while (p < n && is_ws(RD(sc, p))) p++;
                            Py_UCS4 q2 = (p < n) ? RD(sc, p) : 0;
                            if (q2 == '"' || q2 == '\'') {
                                p++;
                                Py_ssize_t e2 = find_char(sc, q2, p);
                                if (e2 == -2) {
                                    Py_DECREF(nm); Py_DECREF(pub);
                                    return -1;
                                }
                                Py_ssize_t st2 = (e2 < 0) ? n : e2;
                                sysid = lower_substr(sc, p, st2);
                                if (!sysid) {
                                    Py_DECREF(nm); Py_DECREF(pub);
                                    return -1;
                                }
                                if (e2 < 0) {
                                    fq = 1;
                                    if (scan_error(sc,
                                            "doctype system id missing "
                                            "closing quote", n) < 0) {
                                        Py_DECREF(nm); Py_DECREF(pub);
                                        Py_DECREF(sysid);
                                        return -1;
                                    }
                                    p = n;
                                } else {
                                    p = e2 + 1;
                                }
                            }
                        } else {
                            sysid = id1;
                        }
                    }
                }
                /* silent skip to '>' (no error even over garbage) */
                Py_ssize_t gt = find_char(sc, '>', p);
                if (gt == -2) {
                    Py_DECREF(nm); Py_XDECREF(pub); Py_XDECREF(sysid);
                    return -1;
                }
                if (emit_fq(sc, T_DOCTYPE, nm, pub, sysid, 0, S_DATA,
                            fq) < 0)
                    return -1;
                i = (gt < 0) ? n : gt + 1;
                continue;
            }
            /* "<!" not comment/doctype: the CDATA branch is gated on
               allow_cdata (builder feedback), which can only be true
               after foreign content — seen_foreign covers the
               document path; fragment contexts are gated in the
               Python wrapper (make_feed bails on "<![CDATA[" when a
               context is given).  The EXACT-case "[CDATA[" probe is
               what the Python machine tests (tokenizer next()). */
            if (sc->seen_foreign && i + 8 < n
                && RD(sc, i + 2) == '[' && RD(sc, i + 3) == 'C'
                && RD(sc, i + 4) == 'D' && RD(sc, i + 5) == 'A'
                && RD(sc, i + 6) == 'T' && RD(sc, i + 7) == 'A'
                && RD(sc, i + 8) == '[')
                BAIL(sc, "cdata-after-foreign");
            /* bogus comment (tokenizer next(), src/tokenizer.c:
               1581-1593): error at the '<', comment data = chars
               after "<!" up to (not incl.) the next '>' or EOF */
            if (scan_error(sc, "bogus markup declaration", i) < 0)
                return -1;
            Py_ssize_t b = i + 2;
            Py_ssize_t gt = find_char(sc, '>', b);
            if (gt == -2) return -1;
            PyObject *d = substr(sc, b, gt < 0 ? n : gt);
            if (!d) return -1;
            if (emit(sc, T_COMMENT, NULL, d, NULL, 0, S_DATA) < 0)
                return -1;
            i = (gt < 0) ? n : gt + 1;
            continue;
        }
        if (is_alpha(c1)) {
            int rc = parse_start_tag(sc, &i);
            if (rc) return rc;
            continue;
        }
        /* '<' before non-special char: literal '<', no error */
        {
            PyObject *d = PyUnicode_FromStringAndSize("<", 1);
            if (!d) return -1;
            if (emit(sc, T_CHAR, NULL, d, NULL, 0, S_DATA) < 0) return -1;
            i++;
        }
    }
    return 0;
}

/* ------------------------------------------------------------------ */
/* module API                                                          */
/* ------------------------------------------------------------------ */

static const char *last_bail = NULL;

static PyObject *
make_feed(PyObject *Py_UNUSED(mod), PyObject *args)
{
    PyObject *text, *errors, *decode_fn = NULL;
    if (!PyArg_ParseTuple(args, "UO|O", &text, &errors, &decode_fn))
        return NULL;
    if (PyUnicode_READY(text) < 0)
        return NULL;

    Scan sc = {0};
    sc.text = text;
    sc.kind = PyUnicode_KIND(text);
    sc.data = PyUnicode_DATA(text);
    sc.n = PyUnicode_GET_LENGTH(text);
    sc.decode_fn = (decode_fn && decode_fn != Py_None) ? decode_fn
                                                       : NULL;
    sc.interns = PyDict_New();
    if (!sc.interns) return NULL;
    sc.lc_line = 1;
    sc.lc_col = 1;

    int rc = scan_all(&sc);
    Py_DECREF(sc.interns);
    Py_CLEAR(sc.pending_errs);  /* set-then-bail leaves a remnant */
    if (rc != 0) {
        recbuf_clear(&sc.rb);
        PyMem_Free(sc.skips);
        if (rc < 0) return NULL;
        last_bail = sc.bail;
        Py_RETURN_NONE;
    }
    last_bail = NULL;

    /* the skipped list the Python tokenizer exposes (appended there
       per raw-scan invocation; the feed is pre-tokenized, so it is
       complete up front — nothing reads it mid-stream) */
    PyObject *skipped = PyList_New(sc.n_skips);
    if (!skipped) {
        recbuf_clear(&sc.rb);
        PyMem_Free(sc.skips);
        return NULL;
    }
    for (Py_ssize_t k = 0; k < sc.n_skips; k++) {
        PyObject *pair = Py_BuildValue("(nn)", sc.skips[k].a,
                                       sc.skips[k].b);
        if (!pair) {
            Py_DECREF(skipped);
            recbuf_clear(&sc.rb);
            PyMem_Free(sc.skips);
            return NULL;
        }
        PyList_SET_ITEM(skipped, k, pair);
    }
    PyMem_Free(sc.skips);
    sc.skips = NULL;

    FastFeed *f = PyObject_New(FastFeed, &FastFeed_Type);
    if (!f) { recbuf_clear(&sc.rb); Py_DECREF(skipped); return NULL; }
    /* null every pointer first so dealloc is safe on partial init */
    f->text = NULL; f->raw_tag = NULL; f->errors = NULL;
    f->skipped = NULL; f->scratch = NULL;
    f->recs = sc.rb.recs;       /* ownership moves */
    f->n = sc.rb.n;
    f->i = 0;
    f->state = S_DATA;
    f->allow_cdata = 0;
    Py_INCREF(text);
    f->text = text;
    f->raw_tag = PyUnicode_FromStringAndSize("", 0);
    Py_INCREF(errors);
    f->errors = errors;
    f->skipped = skipped;       /* ownership moves */
    f->scratch = PyObject_New(FastToken, &FastToken_Type);
    if (!f->raw_tag || !f->scratch) {
        Py_DECREF(f);
        return NULL;
    }
    FastToken *t = f->scratch;
    t->type = T_EOF;
    Py_INCREF(Py_None); t->name = Py_None;
    Py_INCREF(Py_None); t->public_id = Py_None;
    Py_INCREF(Py_None); t->system_id = Py_None;
    Py_INCREF(Py_None); t->data = Py_None;
    Py_INCREF(EMPTY_ATTRS); t->attrs = EMPTY_ATTRS;
    t->self_closing = 0;
    t->force_quirks = 0;
    return (PyObject *)f;
}

static PyObject *
bail_reason(PyObject *Py_UNUSED(mod), PyObject *Py_UNUSED(args))
{
    if (last_bail == NULL)
        Py_RETURN_NONE;
    return PyUnicode_FromString(last_bail);
}

static PyMethodDef module_methods[] = {
    {"make_feed", make_feed, METH_VARARGS,
     "make_feed(text, errors) -> FastFeed | None"},
    {"bail_reason", bail_reason, METH_NOARGS,
     "reason string for the most recent make_feed() bail (tests)"},
    {NULL}
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fastscan", NULL, -1, module_methods,
};

PyMODINIT_FUNC
PyInit__fastscan(void)
{
    if (PyType_Ready(&FastToken_Type) < 0) return NULL;
    if (PyType_Ready(&FastFeed_Type) < 0) return NULL;
    EMPTY_ATTRS = PyList_New(0);
    if (!EMPTY_ATTRS) return NULL;
    PyObject *m = PyModule_Create(&moduledef);
    if (!m) return NULL;
    return m;
}
