"""Foreign-content (SVG/MathML) tables and checks.

Parity targets: /root/reference/src/foreign.c
  - breakout tag set (15-46), <font color/face/size> breakout (48-59)
  - SVG element/attr case-correction maps (75-195)
  - MathML definitionURL (201-205)
  - integration-point checks (211-243)
  - namespace-aware special/scoping sets (251-381)
"""

from __future__ import annotations

from .tokenizer import ascii_lower
from .tree import NS_HTML, NS_MATHML, NS_SVG

BREAKOUT_TAGS = frozenset(
    """a address applet area article aside b base basefont bgsound big
    blockquote body br button caption center code col colgroup dd details
    dir div dl dt em embed fieldset figcaption figure footer form frame
    frameset h1 h2 h3 h4 h5 h6 head header hgroup hr html i iframe img
    input li link listing main marquee menu meta nav nobr noembed noframes
    noscript object ol p param plaintext pre s script section select small
    source span strike strong style sub summary sup table tbody td template
    textarea tfoot th thead title tr track tt u ul var wbr xmp""".split()
)


def font_has_breakout_attr(attrs) -> bool:
    for name, _ in attrs:
        if name in ("color", "face", "size"):
            return True
    return False


SVG_ELEMENT_MAP = {
    "altglyph": "altGlyph", "altglyphdef": "altGlyphDef",
    "altglyphitem": "altGlyphItem", "animatecolor": "animateColor",
    "animatemotion": "animateMotion", "animatetransform": "animateTransform",
    "clippath": "clipPath", "feblend": "feBlend",
    "fecolormatrix": "feColorMatrix",
    "fecomponenttransfer": "feComponentTransfer", "fecomposite": "feComposite",
    "feconvolvematrix": "feConvolveMatrix",
    "fediffuselighting": "feDiffuseLighting",
    "fedisplacementmap": "feDisplacementMap",
    "fedistantlight": "feDistantLight", "fedropshadow": "feDropShadow",
    "feflood": "feFlood", "fefunca": "feFuncA", "fefuncb": "feFuncB",
    "fefuncg": "feFuncG", "fefuncr": "feFuncR",
    "fegaussianblur": "feGaussianBlur", "feimage": "feImage",
    "femerge": "feMerge", "femergenode": "feMergeNode",
    "femorphology": "feMorphology", "feoffset": "feOffset",
    "fepointlight": "fePointLight",
    "fespecularlighting": "feSpecularLighting", "fespotlight": "feSpotLight",
    "fetile": "feTile", "feturbulence": "feTurbulence",
    "foreignobject": "foreignObject", "glyphref": "glyphRef",
    "lineargradient": "linearGradient", "radialgradient": "radialGradient",
    "textpath": "textPath",
}

SVG_ATTR_MAP = {
    "attributename": "attributeName", "attributetype": "attributeType",
    "basefrequency": "baseFrequency", "baseprofile": "baseProfile",
    "calcmode": "calcMode", "clippathunits": "clipPathUnits",
    "diffuseconstant": "diffuseConstant", "edgemode": "edgeMode",
    "filterunits": "filterUnits", "glyphref": "glyphRef",
    "gradienttransform": "gradientTransform", "gradientunits": "gradientUnits",
    "kernelmatrix": "kernelMatrix", "kernelunitlength": "kernelUnitLength",
    "keypoints": "keyPoints", "keysplines": "keySplines",
    "keytimes": "keyTimes", "lengthadjust": "lengthAdjust",
    "limitingconeangle": "limitingConeAngle", "markerheight": "markerHeight",
    "markerunits": "markerUnits", "markerwidth": "markerWidth",
    "maskcontentunits": "maskContentUnits", "maskunits": "maskUnits",
    "numoctaves": "numOctaves", "pathlength": "pathLength",
    "patterncontentunits": "patternContentUnits",
    "patterntransform": "patternTransform", "patternunits": "patternUnits",
    "pointsatx": "pointsAtX", "pointsaty": "pointsAtY",
    "pointsatz": "pointsAtZ", "preservealpha": "preserveAlpha",
    "preserveaspectratio": "preserveAspectRatio",
    "primitiveunits": "primitiveUnits", "refx": "refX", "refy": "refY",
    "repeatcount": "repeatCount", "repeatdur": "repeatDur",
    "requiredextensions": "requiredExtensions",
    "requiredfeatures": "requiredFeatures",
    "specularconstant": "specularConstant",
    "specularexponent": "specularExponent", "spreadmethod": "spreadMethod",
    "startoffset": "startOffset", "stddeviation": "stdDeviation",
    "stitchtiles": "stitchTiles", "surfacescale": "surfaceScale",
    "systemlanguage": "systemLanguage", "tablevalues": "tableValues",
    "targetx": "targetX", "targety": "targetY", "textlength": "textLength",
    "viewbox": "viewBox", "viewtarget": "viewTarget",
    "xchannelselector": "xChannelSelector",
    "ychannelselector": "yChannelSelector", "zoomandpan": "zoomAndPan",
}


def svg_adjust_element_name(lowered):
    return SVG_ELEMENT_MAP.get(lowered, lowered)


def svg_adjust_attr_name(lowered):
    return SVG_ATTR_MAP.get(lowered, lowered)


def mathml_adjust_attr_name(lowered):
    return "definitionURL" if lowered == "definitionurl" else lowered


MATHML_TEXT_INTEGRATION = frozenset(("mi", "mo", "mn", "ms", "mtext"))


def is_mathml_text_integration_point(name) -> bool:
    return name in MATHML_TEXT_INTEGRATION


def is_html_integration_point(name, ns, attrs) -> bool:
    if not name:
        return False
    if ns == NS_SVG:
        return name in ("foreignObject", "desc", "title")
    if ns == NS_MATHML and name == "annotation-xml":
        for aname, aval in attrs:
            if aname == "encoding" and aval is not None:
                v = ascii_lower(aval)
                if v in ("text/html", "application/xhtml+xml"):
                    return True
    return False


HTML_SPECIAL = frozenset(
    """address applet area article aside base basefont blockquote body br
    button caption center col colgroup dd details dir div dl dt embed
    fieldset figcaption figure footer form frame frameset h1 h2 h3 h4 h5 h6
    head header hgroup hr html iframe img input li link listing main marquee
    menu meta nav noembed noframes noscript object ol p param plaintext pre
    script section select source style summary table tbody td template
    textarea tfoot th thead title tr track ul wbr xmp""".split()
)

_MATHML_SPECIAL = frozenset(("mi", "mo", "mn", "ms", "mtext", "annotation-xml"))
_SVG_SPECIAL = frozenset(("foreignObject", "desc", "title"))


def is_special_element_ns(name, ns) -> bool:
    if not name:
        return False
    if ns == NS_HTML:
        return name in HTML_SPECIAL
    if ns == NS_MATHML:
        return name in _MATHML_SPECIAL
    if ns == NS_SVG:
        return name in _SVG_SPECIAL
    return False


HTML_SCOPING = frozenset(
    ("applet", "caption", "html", "table", "td", "th", "marquee", "object",
     "template")
)


def is_scoping_element_ns(name, ns) -> bool:
    if not name:
        return False
    if ns == NS_HTML:
        return name in HTML_SCOPING
    if ns == NS_MATHML:
        return name in _MATHML_SPECIAL
    if ns == NS_SVG:
        return name in _SVG_SPECIAL
    return False
