"""Tree-construction goldens for hostile HTML: adoption agency and
foster parenting, in html5lib-tests ``.dat`` format.

The reference's conformance evidence is the html5lib-tests corpus run
through a tree-dump serializer (/root/reference/examples/html5lib_tests.pl,
published score lib/HTML5/DOM.pod:3318-3377; adoption01/02 pass). That
corpus is not vendored here, so these cases re-derive the expected trees
BY HAND from the WHATWG tree-construction spec (13.2.6.4.7 "in body",
adoption agency algorithm; 13.2.6.1 foster parenting) — an oracle
independent of our implementation. The ``.dat`` syntax and dump format
match the published corpus exactly, so a future drop-in of the real
corpus needs no changes.
"""

import pytest

from perl_html5_dom_spark.dom.constants import NS_MATHML, NS_SVG
from perl_html5_dom_spark.dom.treebuilder import TreeBuilder, parse_fragment
from perl_html5_dom_spark.dom.treedump import tree_format

# Each case: #data <input> #document <golden dump>  (html5lib .dat syntax)
DAT = r'''
#data
<a><p></a></p>
#document
| <html>
|   <head>
|   <body>
|     <a>
|     <p>
|       <a>

#data
<a>1<p>2</a>3</p>
#document
| <html>
|   <head>
|   <body>
|     <a>
|       "1"
|     <p>
|       <a>
|         "2"
|       "3"

#data
<a>1<button>2</a>3</button>
#document
| <html>
|   <head>
|   <body>
|     <a>
|       "1"
|     <button>
|       <a>
|         "2"
|       "3"

#data
<a>1<b>2</a>3</b>
#document
| <html>
|   <head>
|   <body>
|     <a>
|       "1"
|       <b>
|         "2"
|     <b>
|       "3"

#data
<a>1<div>2<div>3</a>4</div>5</div>
#document
| <html>
|   <head>
|   <body>
|     <a>
|       "1"
|     <div>
|       <a>
|         "2"
|       <div>
|         <a>
|           "3"
|         "4"
|       "5"

#data
<table><a>1<p>2</a>3</p>
#document
| <html>
|   <head>
|   <body>
|     <a>
|       "1"
|     <p>
|       <a>
|         "2"
|       "3"
|     <table>

#data
<b><b><a><p></a>
#document
| <html>
|   <head>
|   <body>
|     <b>
|       <b>
|         <a>
|         <p>
|           <a>

#data
<b><a><b><p></a>
#document
| <html>
|   <head>
|   <body>
|     <b>
|       <a>
|         <b>
|       <b>
|         <p>
|           <a>

#data
<a><b><b><p></a>
#document
| <html>
|   <head>
|   <body>
|     <a>
|       <b>
|         <b>
|     <b>
|       <b>
|         <p>
|           <a>

#data
<p>1<s id="A">2<b id="B">3</p>4</s>5</b>
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "1"
|       <s>
|         id="A"
|         "2"
|         <b>
|           id="B"
|           "3"
|     <s>
|       id="A"
|       <b>
|         id="B"
|         "4"
|     <b>
|       id="B"
|       "5"

#data
<b>1<i>2<p>3</b>4
#document
| <html>
|   <head>
|   <body>
|     <b>
|       "1"
|       <i>
|         "2"
|     <i>
|       <p>
|         <b>
|           "3"
|         "4"

#data
<b><i></b>x</i>
#document
| <html>
|   <head>
|   <body>
|     <b>
|       <i>
|     <i>
|       "x"

#data
<nobr>x<nobr>y
#document
| <html>
|   <head>
|   <body>
|     <nobr>
|       "x"
|     <nobr>
|       "y"

#data
<table><div>fost</div><tr><td>x</td></tr></table>
#document
| <html>
|   <head>
|   <body>
|     <div>
|       "fost"
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "x"

#data
A<table>B<tr><td></td></tr>C</table>
#document
| <html>
|   <head>
|   <body>
|     "ABC"
|     <table>
|       <tbody>
|         <tr>
|           <td>

#data
<table><tr><td>x</td></tr>fost</table>
#document
| <html>
|   <head>
|   <body>
|     "fost"
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "x"

#data
<table><b>bold</b><tr><td>x</td></tr></table>
#document
| <html>
|   <head>
|   <body>
|     <b>
|       "bold"
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "x"

#data
<table>   <tr><td>x</td></tr></table>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       "   "
|       <tbody>
|         <tr>
|           <td>
|             "x"

#data
<!DOCTYPE html><svg><title>hidden</title><circle></circle></svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg title>
|         "hidden"
|       <svg circle>

#data
<!DOCTYPE html><math><mi>x</mi><annotation-xml></annotation-xml></math>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <math math>
|       <math mi>
|         "x"
|       <math annotation-xml>

#data
<svg><p>html island</p></svg>
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|     <p>
|       "html island"
'''


# Round-3 family: the reference's own weakest html5lib files
# (lib/HTML5/DOM.pod:3325-3328 — foreign-fragment, tests26, menuitem,
# tests11) plus template / caption / colgroup / select-in-table and
# character references inside attributes.  All expected trees hand-derived
# from WHATWG 13.2.6 ("in template", "in caption", "in column group",
# "in select in table", adoption agency, SVG tag/attribute adjustment,
# attribute character-reference rules).  Fragment cases use the corpus's
# ``#document-fragment`` directive.
DAT2 = r'''
#data
<!DOCTYPE html><template><b>x</b></template>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|     <template>
|       content
|         <b>
|           "x"
|   <body>

#data
<body><template><tr><td>t</td></tr></template>
#document
| <html>
|   <head>
|   <body>
|     <template>
|       content
|         <tr>
|           <td>
|             "t"

#data
<table><template><tr><td>x</td></tr></template></table>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <template>
|         content
|           <tr>
|             <td>
|               "x"

#data
<body>x</template>y
#document
| <html>
|   <head>
|   <body>
|     "xy"

#data
<template><div>
#document
| <html>
|   <head>
|     <template>
|       content
|         <div>
|   <body>

#data
<menuitem>A<menuitem>B
#document
| <html>
|   <head>
|   <body>
|     <menuitem>
|       "A"
|       <menuitem>
|         "B"

#data
<menuitem><p></menuitem>x
#document
| <html>
|   <head>
|   <body>
|     <menuitem>
|       <p>
|         "x"

#data
<table><caption>cap</caption><colgroup><col><tr><td>x
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <caption>
|         "cap"
|       <colgroup>
|         <col>
|       <tbody>
|         <tr>
|           <td>
|             "x"

#data
<table><caption><p>a<p>b</caption><tr><td>c</table>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <caption>
|         <p>
|           "a"
|         <p>
|           "b"
|       <tbody>
|         <tr>
|           <td>
|             "c"

#data
<table><col width="20"><tr><td>x</table>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <colgroup>
|         <col>
|           width="20"
|       <tbody>
|         <tr>
|           <td>
|             "x"

#data
<table><select><option>o</select><tr><td>x</table>
#document
| <html>
|   <head>
|   <body>
|     <select>
|       <option>
|         "o"
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "x"

#data
<table><tr><td><select><option>1<option>2</select></td></tr></table>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             <select>
|               <option>
|                 "1"
|               <option>
|                 "2"

#data
<table><tr><td><select><caption>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             <select>
|       <caption>

#data
<a href="/?a=1&not;b=2&notit=3">x</a>
#document
| <html>
|   <head>
|   <body>
|     <a>
|       href="/?a=1¬b=2&notit=3"
|       "x"

#data
<!DOCTYPE html><body><svg attributename="x" viewbox="0 0 1 1"><foreignobject><p>h</p></foreignobject></svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       attributeName="x"
|       viewBox="0 0 1 1"
|       <svg foreignObject>
|         <p>
|           "h"

#data
<!DOCTYPE html><body><b><nobr>1<nobr></b><i><nobr>2<nobr></i>3
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <b>
|       <nobr>
|         "1"
|       <nobr>
|     <nobr>
|       <i>
|     <i>
|       <nobr>
|         "2"
|       <nobr>
|     <nobr>
|       "3"

#data
<!DOCTYPE html><svg><textpath></textpath><lineargradient></lineargradient></svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg textPath>
|       <svg linearGradient>

#data
<text>t</text><rect/>
#document-fragment
svg svg
#document
| <svg text>
|   "t"
| <svg rect>

#data
<foreignObject><div>x</div></foreignObject>
#document-fragment
svg path
#document
| <svg foreignObject>
|   <div>
|     "x"

#data
<b>x</b>
#document-fragment
svg desc
#document
| <b>
|   "x"

#data
<b>y
#document-fragment
math ms
#document
| <b>
|   "y"

#data
<div>d</div>
#document-fragment
svg title
#document
| <div>
|   "d"
'''

# Round-3 family #3: rawtext/rcdata/plaintext elements, the pre/listing/
# textarea leading-newline rule, the form element pointer, select
# machinery, frameset, marquee scope markers, ruby, the <image> alias —
# expected trees hand-derived from WHATWG 13.2.5 (tokenizer data states),
# 13.2.6.4.7 ("in body": pre/listing/textarea/form/button/marquee/image)
# and 13.2.6.4.16 ("in select" / "in select in table").
DAT3 = r"""
#data
<!DOCTYPE html><pre>
first</pre>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <pre>
|       "first"

#data
<!DOCTYPE html><pre>

x</pre>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <pre>
|       "
x"

#data
<!DOCTYPE html><textarea>
t</textarea>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <textarea>
|       "t"

#data
<!DOCTYPE html><listing>
l</listing>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <listing>
|       "l"

#data
<!DOCTYPE html><plaintext>a<b>c
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <plaintext>
|       "a<b>c"

#data
<!DOCTYPE html><form><input><form><p>x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <form>
|       <input>
|       <p>
|         "x"

#data
<!DOCTYPE html><select><option>a<option>b</select>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <select>
|       <option>
|         "a"
|       <option>
|         "b"

#data
<!DOCTYPE html><p><select><optgroup><option>x</select>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       <select>
|         <optgroup>
|           <option>
|             "x"

#data
<!DOCTYPE html><frameset><frame src=a><noframes>x</noframes></frameset>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <frameset>
|     <frame>
|       src="a"
|     <noframes>
|       "x"

#data
<!DOCTYPE html><xmp><b>raw</b></xmp>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <xmp>
|       "<b>raw</b>"

#data
<!DOCTYPE html><iframe>a<b>c</iframe>d
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <iframe>
|       "a<b>c"
|     "d"

#data
<!DOCTYPE html><p><image src=x>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       <img>
|         src="x"

#data
<!DOCTYPE html><button>a<button>b
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <button>
|       "a"
|     <button>
|       "b"

#data
<!DOCTYPE html><marquee><p>m</marquee></p>x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <marquee>
|       <p>
|         "m"
|     <p>
|     "x"

#data
<!DOCTYPE html><ruby><rb>a<rt>b</ruby>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <ruby>
|       <rb>
|         "a"
|       <rt>
|         "b"

#data
<!DOCTYPE html><table><tr><td><select><option>o<td>x</table>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             <select>
|               <option>
|                 "o"
|           <td>
|             "x"
"""


# Round-3 family #4: AFE-marker containers (marquee/object/applet) and
# template/select interplay — expected trees hand-derived from WHATWG
# 13.2.6.4.7 (marker push on marquee/object/applet; clear-to-marker on
# close), button-scope rules, "in select" template handling and the
# end-template behavior inside select.
DAT4 = r"""
#data
<!DOCTYPE html><b>a<marquee><i>in</marquee>out
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <b>
|       "a"
|       <marquee>
|         <i>
|           "in"
|       "out"

#data
<!DOCTYPE html><p><object><p>in</object>after
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       <object>
|         <p>
|           "in"
|       "after"

#data
<!DOCTYPE html><applet><li>x</applet>y
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <applet>
|       <li>
|         "x"
|     "y"

#data
<!DOCTYPE html><select><template></select>x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <select>
|       <template>
|         content
|           "x"

#data
<!DOCTYPE html><template><select>s</template>t
#document
| <!DOCTYPE html>
| <html>
|   <head>
|     <template>
|       content
|         <select>
|           "s"
|   <body>
|     "t"

#data
<!DOCTYPE html><div><marquee><b></div><marquee>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <div>
|       <marquee>
|         <b>
|           <marquee>

#data
<!DOCTYPE html><table><select><option>o<td>c</table>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <select>
|       <option>
|         "o"
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "c"

#data
<!DOCTYPE html><object><param name=a><img src=b></object>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <object>
|       <param>
|         name="a"
|       <img>
|         src="b"
"""


# Family #5: structural edge cases a crawl hits constantly —
# implied/stray end tags, form pointer in tables, attribute
# merging on duplicate html/body, list/definition/ruby implied
# ends, select legacy "anything else: ignore" (the reference-era
# spec; modern hr-in-select is a post-MyHTML addition), rawtext
# leading-newline, hidden-input-in-table non-fostering, CDATA in
# foreign content.  Hand-derived from WHATWG 13.2.6.
DAT5 = r'''
#data
<!DOCTYPE html><body></p>x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|     "x"

#data
<!DOCTYPE html><body></br>x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <br>
|     "x"

#data
<!DOCTYPE html><body><form><form><input></form>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <form>
|       <input>

#data
<!DOCTYPE html><body><table><form><tr><td>c</table>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <table>
|       <form>
|       <tbody>
|         <tr>
|           <td>
|             "c"

#data
<html><head></head><body a="1"><body b="2">x
#document
| <html>
|   <head>
|   <body>
|     a="1"
|     b="2"
|     "x"

#data
<!DOCTYPE html><ul><li>a<div><li>b</ul>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <ul>
|       <li>
|         "a"
|         <div>
|       <li>
|         "b"

#data
<!DOCTYPE html><dl><dt>t<dd>d<dt>t2</dl>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <dl>
|       <dt>
|         "t"
|       <dd>
|         "d"
|       <dt>
|         "t2"

#data
<!DOCTYPE html><a href=1>x<a href=2>y</a></a>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <a>
|       href="1"
|       "x"
|     <a>
|       href="2"
|       "y"

#data
<!DOCTYPE html><nobr>a<nobr>b</nobr>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <nobr>
|       "a"
|     <nobr>
|       "b"

#data
<!DOCTYPE html><ruby>base<rt>anno<rp>(</rp></ruby>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <ruby>
|       "base"
|       <rt>
|         "anno"
|       <rp>
|         "("

#data
<!DOCTYPE html><body><optgroup><option>a<option>b<optgroup><option>c
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <optgroup>
|       <option>
|         "a"
|       <option>
|         "b"
|       <optgroup>
|         <option>
|           "c"

#data
<!DOCTYPE html><table><td>c</table>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "c"

#data
<!DOCTYPE html><listing>
code</listing>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <listing>
|       "code"

#data
<!DOCTYPE html><table><col span=2></table>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <table>
|       <colgroup>
|         <col>
|           span="2"

#data
<!DOCTYPE html><table><caption>c<tr><td>d</table>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <table>
|       <caption>
|         "c"
|       <tbody>
|         <tr>
|           <td>
|             "d"

#data
<!DOCTYPE html><table><input type="hidden" name="h"><tr><td>c</table>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <table>
|       <input>
|         name="h"
|         type="hidden"
|       <tbody>
|         <tr>
|           <td>
|             "c"

#data
<!DOCTYPE html><body><keygen>x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <keygen>
|     "x"

#data
<!DOCTYPE html><select><option>a<hr><option>b</select>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <select>
|       <option>
|         "a"
|       <hr>
|       <option>
|         "b"

#data
<!DOCTYPE html><body><plaintext>a<b>c
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <plaintext>
|       "a<b>c"

#data
<!DOCTYPE html><body><xmp><b>raw</b></xmp>tail
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <xmp>
|       "<b>raw</b>"
|     "tail"

#data
<!DOCTYPE html><body><svg><![CDATA[x<b>y]]></svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       "x<b>y"
'''


_FRAG_NS = {"svg": NS_SVG, "math": NS_MATHML}


def parse_dat(dat: str):
    """html5lib .dat blocks -> (data, fragment_context | None,
    scripting | None, expected).  Fragment context is the corpus's
    ``#document-fragment`` directive: a bare tag name, or ``svg <tag>``
    / ``math <tag>``.  Scripting is pinned by ``#script-on`` /
    ``#script-off`` (None = engine default, scripts=True)."""
    cases = []
    for block in dat.split("#data\n"):
        block = block.strip("\n")
        if not block:
            continue
        head, _, doc = block.partition("\n#document\n")
        script = None
        for flag, val in (("\n#script-on", True), ("\n#script-off", False)):
            if head.endswith(flag):
                head, script = head[: -len(flag)], val
        data, _, frag = head.partition("\n#document-fragment\n")
        cases.append((data, frag.strip() or None, script, doc.rstrip("\n")))
    return cases


# Round-3 family #6: fragment parsing — the reference's weakest
# conformance territory (foreign-fragment contexts: lib/HTML5/DOM.pod:
# 3325-3328) plus table/select/template/rawtext contexts.  Each case
# was audited against WHATWG §13.4 (fragment algorithm: context-element
# tokenizer states, template insertion-mode seeding, adjusted-current-
# node = context when the stack holds only the root) before pinning;
# authoring this family found and fixed two fragment bugs (template
# mode-stack seeding, in-body EOF with a non-empty template mode stack
# looping in the fragment case).
DAT6 = r'''
#data
<b>x</b><path d=1>
#document-fragment
svg path
#document
| <b>
|   "x"
| <svg path>
|   d="1"

#data
<b>x
#document-fragment
math mi
#document
| <b>
|   "x"

#data
<mi>y</mi><b>x
#document-fragment
math annotation-xml
#document
| <math mi>
|   "y"
| <b>
|   "x"

#data
<p>h</p><svg><circle>
#document-fragment
svg foreignObject
#document
| <p>
|   "h"
| <svg svg>
|   <svg circle>

#data
t<b>x
#document-fragment
svg desc
#document
| "t"
| <b>
|   "x"

#data
<td>a<td>b
#document-fragment
tr
#document
| <td>
|   "a"
| <td>
|   "b"

#data
<tr><td>a
#document-fragment
table
#document
| <tbody>
|   <tr>
|     <td>
|       "a"

#data
<tr><td>a
#document-fragment
tbody
#document
| <tr>
|   <td>
|     "a"

#data
x<table><td>y
#document-fragment
td
#document
| "x"
| <table>
|   <tbody>
|     <tr>
|       <td>
|         "y"

#data
<option>a<optgroup>b<option>c
#document-fragment
select
#document
| <option>
|   "a"
| <optgroup>
|   "b"
|   <option>
|     "c"

#data
<head><meta></head><body>x
#document-fragment
html
#document
| <head>
|   <meta>
| <body>
|   "x"

#data
a<b>c&amp;
#document-fragment
title
#document
| "a<b>c&"

#data
if (a<b) {}
#document-fragment
script
#document
| "if (a<b) {}"

#data
<caption>c</caption><tr>
#document-fragment
table
#document
| <caption>
|   "c"
| <tbody>
|   <tr>

#data
<col><col span=2>
#document-fragment
colgroup
#document
| <col>
| <col>
|   span="2"

#data
<td>x
#document-fragment
template
#document
| <td>
|   "x"

#data
<col>
#document-fragment
template
#document
| <col>

#data
<template><td>n</template>m
#document-fragment
template
#document
| <template>
|   content
|     <td>
|       "n"
| "m"

#data
<font face=x>y
#document-fragment
svg svg
#document
| <font>
|   face="x"
|   "y"

#data
<figure>f
#document-fragment
math ms
#document
| <figure>
|   "f"
'''


# Round-4 family #7: corpus breadth the 67-set did not sample (VERDICT r3
# #3): the doctype/quirks matrix (quirks01 territory: public/system-id
# forms, the quirks-mode p-in-table nesting rule, limited-quirks),
# entities01/02 edge forms (legacy no-semicolon refs in text vs
# attributes, numeric C1/surrogate remapping, max-munch &notit;),
# tests9/10 foreign-content nuances (integration points, breakout
# tags, conditional font breakout, camelCase/xlink adjustment, CDATA
# vs bogus comment), the PLAINTEXT family, and the frameset family.
# Every tree re-derived by hand from WHATWG 13.2.5/13.2.6 before
# pinning; none copied from the (unvendored) corpus.
DAT7 = r'''
#data
<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01//EN" "http://www.w3.org/TR/html4/strict.dtd"><p>x
#document
| <!DOCTYPE html "-//W3C//DTD HTML 4.01//EN" "http://www.w3.org/TR/html4/strict.dtd">
| <html>
|   <head>
|   <body>
|     <p>
|       "x"

#data
<!DOCTYPE html SYSTEM "about:legacy-compat"><p>x
#document
| <!DOCTYPE html "" "about:legacy-compat">
| <html>
|   <head>
|   <body>
|     <p>
|       "x"

#data
<!DOCTYPE html><p>1<table><td>2</table>3
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       "1"
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "2"
|     "3"

#data
<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01 Transitional//EN"><p>1<table><td>2</table>3
#document
| <!DOCTYPE html "-//W3C//DTD HTML 4.01 Transitional//EN" "">
| <html>
|   <head>
|   <body>
|     <p>
|       "1"
|       <table>
|         <tbody>
|           <tr>
|             <td>
|               "2"
|       "3"

#data
<!DOCTYPE><p><table>
#document
| <!DOCTYPE >
| <html>
|   <head>
|   <body>
|     <p>
|       <table>

#data
<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Transitional//EN" "http://www.w3.org/TR/xhtml1/DTD/xhtml1-transitional.dtd"><p><table>
#document
| <!DOCTYPE html "-//W3C//DTD XHTML 1.0 Transitional//EN" "http://www.w3.org/TR/xhtml1/DTD/xhtml1-transitional.dtd">
| <html>
|   <head>
|   <body>
|     <p>
|     <table>

#data
<!DOCTYPE html
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>

#data
<!DOCTYPE html><p>&notit;
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       "¬it;"

#data
<!DOCTYPE html><p>&notin;
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       "∉"

#data
<!DOCTYPE html><p title="&noti;">x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       title="&noti;"
|       "x"

#data
<!DOCTYPE html><a href="?a=b&not;c">x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <a>
|       href="?a=b¬c"
|       "x"

#data
<!DOCTYPE html><p>x&ampy
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       "x&y"

#data
<!DOCTYPE html><a b="x&ampy">z
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <a>
|       b="x&ampy"
|       "z"

#data
<!DOCTYPE html><p>&#65;&#x42;&#67
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       "ABC"

#data
<!DOCTYPE html><p>a&#0;b&#x80;c&#xD800;d
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       "a�b€c�d"

#data
<!DOCTYPE html><p>&; &x &
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       "&; &x &"

#data
<!DOCTYPE html><p>&#xG;
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       "&#xG;"

#data
<!DOCTYPE html><p>&AMP;&Amp;
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       "&&Amp;"

#data
<!DOCTYPE html><p>a&nbspb
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       "a b"

#data
<!DOCTYPE html><style>&amp;</style>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|     <style>
|       "&amp;"
|   <body>

#data
<!DOCTYPE html><textarea>&amp;&notit;</textarea>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <textarea>
|       "&¬it;"

#data
<!DOCTYPE html><math><mtext><p>x</p></mtext></math>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <math math>
|       <math mtext>
|         <p>
|           "x"

#data
<!DOCTYPE html><svg><desc><div>x</div></desc></svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg desc>
|         <div>
|           "x"

#data
<!DOCTYPE html><math><annotation-xml encoding="text/html"><p>x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <math math>
|       <math annotation-xml>
|         encoding="text/html"
|         <p>
|           "x"

#data
<!DOCTYPE html><math><annotation-xml encoding="foo"><p>x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <math math>
|       <math annotation-xml>
|         encoding="foo"
|     <p>
|       "x"

#data
<!DOCTYPE html><svg><g><b>x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg g>
|     <b>
|       "x"

#data
<!DOCTYPE html><svg><font face="a">x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|     <font>
|       face="a"
|       "x"

#data
<!DOCTYPE html><svg><font id="a">x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg font>
|         id="a"
|         "x"

#data
<!DOCTYPE html><svg><feBlend><fepointlight>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg feBlend>
|         <svg fePointLight>

#data
<!DOCTYPE html><svg><![CDATA[x<y&amp;]]></svg>z
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       "x<y&amp;"
|     "z"

#data
<!DOCTYPE html><div><![CDATA[x]]></div>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <div>
|       <!-- [CDATA[x]] -->

#data
<!DOCTYPE html><svg><a xlink:href="u" xml:lang="en">t
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg a>
|         xlink href="u"
|         xml lang="en"
|         "t"

#data
<!DOCTYPE html><math><mtext><svg><circle></svg>t</mtext>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <math math>
|       <math mtext>
|         <svg svg>
|           <svg circle>
|         "t"

#data
<!DOCTYPE html><plaintext>x</plaintext><b>&amp;
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <plaintext>
|       "x</plaintext><b>&amp;"

#data
<!DOCTYPE html><table><plaintext>xy
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <plaintext>
|       "xy"
|     <table>

#data
<!DOCTYPE html><frameset><frame src="a"><noframes>x</noframes></frameset>y
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <frameset>
|     <frame>
|       src="a"
|     <noframes>
|       "x"

#data
<!DOCTYPE html>x<frameset>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     "x"

#data
<!DOCTYPE html><body><frameset>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>

#data
<!DOCTYPE html><head></head><frameset>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <frameset>

#data
<!DOCTYPE html><frameset cols="2"><frameset rows="1"><frame></frameset><frame></frameset>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <frameset>
|     cols="2"
|     <frameset>
|       rows="1"
|       <frame>
|     <frame>

#data
<!DOCTYPE html><frameset></frameset><noframes>x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <frameset>
|   <noframes>
|     "x"

#data
<!DOCTYPE html><frameset></frameset><!--c-->
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <frameset>
|   <!-- c -->
'''


# Round-4 family #8: small remainder set — in-head noscript under
# the default scripting-ON flag (rawtext; the scripts=False
# in-head-noscript mode is pinned in test_treebuilder),
# h1->h2 implied close, after-body comment placement,
# and the bogus-comment tokenizer states (<? markup declaration,
# abrupt <!-->, end-tag-with-space </ p>).
DAT8 = r'''
#data
<!DOCTYPE html><head><noscript><link href="a"><div>x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|     <noscript>
|       "<link href="a"><div>x"
|   <body>

#data
<!DOCTYPE html><h1>a<h2>b
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <h1>
|       "a"
|     <h2>
|       "b"

#data
<!DOCTYPE html><body>x</body><!--c-->
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     "x"
|   <!-- c -->

#data
<!DOCTYPE html><p>a<?php echo ?>b
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       "a"
|       <!-- ?php echo ? -->
|       "b"

#data
<!DOCTYPE html><p>a<!-->b
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       "a"
|       <!--  -->
|       "b"

#data
<!DOCTYPE html><p>a</ p>b
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       "a"
|       <!--  p -->
|       "b"

#data
<!DOCTYPE html><svg><g></br>x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg g>
|     <br>
|     "x"

#data
<!DOCTYPE html><math><mi></p>x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <math math>
|       <math mi>
|         <p>
|         "x"

#data
<!DOCTYPE html><template><tr><iframe></iframe>x</template>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|     <template>
|       content
|         <tr>
|         <iframe>
|         "x"
|   <body>

#data
<!DOCTYPE html><table><tr><iframe></iframe>x</table>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <iframe>
|     "x"
|     <table>
|       <tbody>
|         <tr>

#data
<!DOCTYPE html><p>&CounterClockwiseContourIntegral;&#x9F;&#x10FFFF;
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       "∳Ÿ􏿿"
'''


# Round-5 family: foreign content breadth (tests11/12 territory —
# the reference's own worst corpus file, lib/HTML5/DOM.pod:3325-3328).
# SVG tag-name adjustments (full WHATWG 13.2.6.5 table), SVG/MathML
# attribute adjustments, xlink/xml/xmlns foreign attributes,
# annotation-xml encoding matrix, text/HTML integration points,
# breakout tags (font with/without color|face|size), CDATA sections,
# character references in foreign text, foster-parenting interplay.
# Each expectation hand-derived from WHATWG §13.2.6.5 ("adjust SVG/
# MathML/foreign attributes", "any other start tag" in foreign
# content) before pinning.
DAT9 = r"""
#data
<!DOCTYPE html><body><svg><altglyph /><altglyphdef /><altglyphitem /><animatecolor /><animatemotion /><animatetransform /></svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg altGlyph>
|       <svg altGlyphDef>
|       <svg altGlyphItem>
|       <svg animateColor>
|       <svg animateMotion>
|       <svg animateTransform>

#data
<!DOCTYPE html><body><svg><clippath /><feblend /><fecolormatrix /><fecomponenttransfer /><fecomposite /><feconvolvematrix /><fediffuselighting /><fedisplacementmap /></svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg clipPath>
|       <svg feBlend>
|       <svg feColorMatrix>
|       <svg feComponentTransfer>
|       <svg feComposite>
|       <svg feConvolveMatrix>
|       <svg feDiffuseLighting>
|       <svg feDisplacementMap>

#data
<!DOCTYPE html><body><svg><fedistantlight /><fedropshadow /><feflood /><fefunca /><fefuncb /><fefuncg /><fefuncr /><fegaussianblur /></svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg feDistantLight>
|       <svg feDropShadow>
|       <svg feFlood>
|       <svg feFuncA>
|       <svg feFuncB>
|       <svg feFuncG>
|       <svg feFuncR>
|       <svg feGaussianBlur>

#data
<!DOCTYPE html><body><svg><feimage /><femerge /><femergenode /><femorphology /><feoffset /><fepointlight /><fespecularlighting /><fespotlight /></svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg feImage>
|       <svg feMerge>
|       <svg feMergeNode>
|       <svg feMorphology>
|       <svg feOffset>
|       <svg fePointLight>
|       <svg feSpecularLighting>
|       <svg feSpotLight>

#data
<!DOCTYPE html><body><svg><fetile /><feturbulence /><foreignobject /><glyphref /><lineargradient /><radialgradient /><textpath /></svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg feTile>
|       <svg feTurbulence>
|       <svg foreignObject>
|       <svg glyphRef>
|       <svg linearGradient>
|       <svg radialGradient>
|       <svg textPath>

#data
<!DOCTYPE html><body><svg><solidcolor /><rect /><UNKNOWN />x</svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg solidcolor>
|       <svg rect>
|       <svg unknown>
|       "x"

#data
<!DOCTYPE html><body><svg attributename="x" attributetype="y" basefrequency="z" calcmode="a" clippathunits="b" diffuseconstant="c" edgemode="d"></svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       attributeName="x"
|       attributeType="y"
|       baseFrequency="z"
|       calcMode="a"
|       clipPathUnits="b"
|       diffuseConstant="c"
|       edgeMode="d"

#data
<!DOCTYPE html><body><svg filterunits="x" glyphref="y" gradienttransform="z" gradientunits="a" kernelmatrix="b" kernelunitlength="c" keypoints="d" keysplines="e" keytimes="f"></svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       filterUnits="x"
|       glyphRef="y"
|       gradientTransform="z"
|       gradientUnits="a"
|       kernelMatrix="b"
|       kernelUnitLength="c"
|       keyPoints="d"
|       keySplines="e"
|       keyTimes="f"

#data
<!DOCTYPE html><body><svg lengthadjust="x" limitingconeangle="y" markerheight="z" markerunits="a" markerwidth="b" maskcontentunits="c" maskunits="d" numoctaves="e"></svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       lengthAdjust="x"
|       limitingConeAngle="y"
|       markerHeight="z"
|       markerUnits="a"
|       markerWidth="b"
|       maskContentUnits="c"
|       maskUnits="d"
|       numOctaves="e"

#data
<!DOCTYPE html><body><svg pathlength="x" patterncontentunits="y" patterntransform="z" patternunits="a" pointsatx="b" pointsaty="c" pointsatz="d" preservealpha="e" preserveaspectratio="f"></svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       pathLength="x"
|       patternContentUnits="y"
|       patternTransform="z"
|       patternUnits="a"
|       pointsAtX="b"
|       pointsAtY="c"
|       pointsAtZ="d"
|       preserveAlpha="e"
|       preserveAspectRatio="f"

#data
<!DOCTYPE html><body><svg primitiveunits="x" refx="y" refy="z" repeatcount="a" repeatdur="b" requiredextensions="c" requiredfeatures="d" specularconstant="e"></svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       primitiveUnits="x"
|       refX="y"
|       refY="z"
|       repeatCount="a"
|       repeatDur="b"
|       requiredExtensions="c"
|       requiredFeatures="d"
|       specularConstant="e"

#data
<!DOCTYPE html><body><svg specularexponent="x" spreadmethod="y" startoffset="z" stddeviation="a" stitchtiles="b" surfacescale="c" systemlanguage="d" tablevalues="e"></svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       specularExponent="x"
|       spreadMethod="y"
|       startOffset="z"
|       stdDeviation="a"
|       stitchTiles="b"
|       surfaceScale="c"
|       systemLanguage="d"
|       tableValues="e"

#data
<!DOCTYPE html><body><svg targetx="x" targety="y" textlength="z" viewbox="a" viewtarget="b" xchannelselector="c" ychannelselector="d" zoomandpan="e" contentscripttype="f"></svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       contentscripttype="f"
|       targetX="x"
|       targetY="y"
|       textLength="z"
|       viewBox="a"
|       viewTarget="b"
|       xChannelSelector="c"
|       yChannelSelector="d"
|       zoomAndPan="e"

#data
<!DOCTYPE html><body><svg xlink:href="x" xml:lang="en" xmlns="u" xmlns:xlink="v" xlink:title="t" xml:space="s"><g xlink:actuate="a" xml:base="b" /></svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       xlink href="x"
|       xlink title="t"
|       xml lang="en"
|       xml space="s"
|       xmlns xmlns="u"
|       xmlns xlink="v"
|       <svg g>
|         xlink actuate="a"
|         xml base="b"

#data
<!DOCTYPE html><body><math definitionurl="x" DefinitionUrl="y"><mi definitionurl="z" /></math>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <math math>
|       definitionURL="x"
|       <math mi>
|         definitionURL="z"

#data
<!DOCTYPE html><body><math><annotation-xml><div>x</div></annotation-xml></math>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <math math>
|       <math annotation-xml>
|     <div>
|       "x"

#data
<!DOCTYPE html><body><math><annotation-xml encoding="text/html"><div>x</div></annotation-xml></math>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <math math>
|       <math annotation-xml>
|         encoding="text/html"
|         <div>
|           "x"

#data
<!DOCTYPE html><body><math><annotation-xml encoding="application/xhtml+xml"><div>x</div></annotation-xml></math>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <math math>
|       <math annotation-xml>
|         encoding="application/xhtml+xml"
|         <div>
|           "x"

#data
<!DOCTYPE html><body><math><annotation-xml encoding="TEXT/HTML"><p>x</p></annotation-xml></math>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <math math>
|       <math annotation-xml>
|         encoding="TEXT/HTML"
|         <p>
|           "x"

#data
<!DOCTYPE html><body><math><mi>x<b>y</b></mi><mn>1<div>2</div></mn></math>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <math math>
|       <math mi>
|         "x"
|         <b>
|           "y"
|       <math mn>
|         "1"
|         <div>
|           "2"

#data
<!DOCTYPE html><body><math><ms><s>x</s></ms><mtext><i>y</i></mtext></math>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <math math>
|       <math ms>
|         <s>
|           "x"
|       <math mtext>
|         <i>
|           "y"

#data
<!DOCTYPE html><body><svg><foreignObject><p>x<table><tr><td>y</td></tr></table></foreignObject></svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg foreignObject>
|         <p>
|           "x"
|         <table>
|           <tbody>
|             <tr>
|               <td>
|                 "y"

#data
<!DOCTYPE html><body><svg><desc><b>bold</b></desc><title>t<em>e</em></title><rect /></svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg desc>
|         <b>
|           "bold"
|       <svg title>
|         "t"
|         <em>
|           "e"
|       <svg rect>

#data
<!DOCTYPE html><body><svg><g>a<p>b
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg g>
|         "a"
|     <p>
|       "b"

#data
<!DOCTYPE html><body><svg><g><blockquote>x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg g>
|     <blockquote>
|       "x"

#data
<!DOCTYPE html><body><svg><font>x</font></svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg font>
|         "x"

#data
<!DOCTYPE html><body><svg><font face="serif">x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|     <font>
|       face="serif"
|       "x"

#data
<!DOCTYPE html><body><svg><font size="7">x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|     <font>
|       size="7"
|       "x"

#data
<!DOCTYPE html><body><svg><font color="red">x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|     <font>
|       color="red"
|       "x"

#data
<!DOCTYPE html><body><svg><g><ul>x<li>y
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg g>
|     <ul>
|       "x"
|       <li>
|         "y"

#data
<!DOCTYPE html><body><svg><![CDATA[foo&amp;bar]]></svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       "foo&amp;bar"

#data
<!DOCTYPE html><body><div><![CDATA[foo]]></div>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <div>
|       <!-- [CDATA[foo]] -->

#data
<!DOCTYPE html><body><svg><![CDATA[foo]]]]><![CDATA[>more]]></svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       "foo]]>more"

#data
<!DOCTYPE html><body><math><mglyph /><malignmark /><mi><mglyph /><malignmark /></mi></math>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <math math>
|       <math mglyph>
|       <math malignmark>
|       <math mi>
|         <math mglyph>
|         <math malignmark>

#data
<!DOCTYPE html><body><svg><script>a<b</script><style>c{}</style></svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg script>
|         "a"
|         <svg b<>
|           script=""
|           <svg style>
|             "c{}"

#data
<!DOCTYPE html><body><svg>text&amp;<g>&lt;tag&gt;</g></svg>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       "text&"
|       <svg g>
|         "<tag>"

#data
<!DOCTYPE html><body><table><svg><g>x</g></svg><tr><td>y
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg g>
|         "x"
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "y"

#data
<!DOCTYPE html><body><svg><g></svg>after
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg g>
|     "after"

#data
<!DOCTYPE html><body><math><mo>&it;&af;</mo></math>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <math math>
|       <math mo>
|         "⁢⁡"

#data
<!DOCTYPE html><p><svg><desc><p>nested
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       <svg svg>
|         <svg desc>
|           <p>
|             "nested"
"""


# Round-5 family: ruby implied-end-tags (tests20 territory: rb/rt/rtc/
# rp against WHATWG "in body" ruby rules), adoption-agency deep cases
# (adoption01 territory: bookmark placement, furthest-block reparenting,
# Noah's Ark sibling runs), the noscript scripting-flag matrix
# (#script-on/#script-off: RAWTEXT vs in-head-noscript vs in-body),
# and post-2017-spec isindex/menuitem (ordinary unknown elements —
# the reference's Modest engine kept the legacy expansions; we follow
# the current spec, which removed them).  Fragment cases cover the
# §13.4 noscript tokenizer-state fork (scripting off => data state;
# authoring this family found and fixed that bug) and ruby contexts
# (context element not on the stack => no implied-end generation).
DAT10 = r"""
#data
<!DOCTYPE html><ruby><rb>a<rb>b<rt>c<rt>d<rp>e</ruby>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <ruby>
|       <rb>
|         "a"
|       <rb>
|         "b"
|       <rt>
|         "c"
|       <rt>
|         "d"
|       <rp>
|         "e"

#data
<!DOCTYPE html><ruby><a><rb>x</ruby>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <ruby>
|       <a>
|         <rb>
|           "x"

#data
<!DOCTYPE html><ruby><rb><rtc><rt>x<rt>y</rtc><rb>z</ruby>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <ruby>
|       <rb>
|       <rtc>
|         <rt>
|           "x"
|         <rt>
|           "y"
|       <rb>
|         "z"

#data
<!DOCTYPE html><ruby><rp>(<rt>x<rp>)</ruby>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <ruby>
|       <rp>
|         "("
|       <rt>
|         "x"
|       <rp>
|         ")"

#data
<!DOCTYPE html><ruby><rtc><rp>a<rt>b</rtc></ruby>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <ruby>
|       <rtc>
|         <rp>
|           "a"
|         <rt>
|           "b"

#data
<!DOCTYPE html><ruby><div><rt>x</div></ruby>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <ruby>
|       <div>
|         <rt>
|           "x"

#data
<!DOCTYPE html><body><rb>a<rt>b
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <rb>
|       "a"
|       <rt>
|         "b"

#data
<!DOCTYPE html><ruby>base<rtc>r1<rtc>r2</ruby>tail
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <ruby>
|       "base"
|       <rtc>
|         "r1"
|       <rtc>
|         "r2"
|     "tail"

#data
<!DOCTYPE html><ruby><span><rb>in</span></ruby>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <ruby>
|       <span>
|         <rb>
|           "in"

#data
<!DOCTYPE html><ruby><rt><p>x<rb>y</ruby>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <ruby>
|       <rt>
|         <p>
|           "x"
|       <rb>
|         "y"

#data
<b><em><foo><foob><fooc><aside></b></em>
#document
| <html>
|   <head>
|   <body>
|     <b>
|       <em>
|         <foo>
|           <foob>
|             <fooc>
|     <aside>
|       <b>

#data
<p>1<s id="A">2<b id="B">3</p>4</s>5</b>
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "1"
|       <s>
|         id="A"
|         "2"
|         <b>
|           id="B"
|           "3"
|     <s>
|       id="A"
|       <b>
|         id="B"
|         "4"
|     <b>
|       id="B"
|       "5"

#data
<a><div><style></style><address><a>
#document
| <html>
|   <head>
|   <body>
|     <a>
|     <div>
|       <a>
|         <style>
|       <address>
|         <a>
|         <a>

#data
<b>1<i>2<p>3</b>4
#document
| <html>
|   <head>
|   <body>
|     <b>
|       "1"
|       <i>
|         "2"
|     <i>
|       <p>
|         <b>
|           "3"
|         "4"

#data
<!DOCTYPE html><b><nobr>1<nobr>2<nobr>3
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <b>
|       <nobr>
|         "1"
|       <nobr>
|         "2"
|       <nobr>
|         "3"

#data
<!DOCTYPE html><a href="1"><div><div><a href="2">x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <a>
|       href="1"
|     <div>
|       <a>
|         href="1"
|       <div>
|         <a>
|           href="1"
|         <a>
|           href="2"
|           "x"

#data
<!DOCTYPE html><b><table><td></b><i></table>x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <b>
|       <table>
|         <tbody>
|           <tr>
|             <td>
|               <i>
|       "x"

#data
<!DOCTYPE html><em><strong><code>1</em>2</strong>3</code>4
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <em>
|       <strong>
|         <code>
|           "1"
|     <strong>
|       <code>
|         "2"
|     <code>
|       "3"
|     "4"

#data
<!DOCTYPE html><div><b><div><i>x</b>y</i>z
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <div>
|       <b>
|       <div>
|         <b>
|           <i>
|             "x"
|         <i>
|           "y"
|         "z"

#data
<!DOCTYPE html><u><u><u>1</u>2</u>3</u>4<u>5
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <u>
|       <u>
|         <u>
|           "1"
|         "2"
|       "3"
|     "4"
|     <u>
|       "5"

#data
<!DOCTYPE html><head><noscript><style>p{}</style></noscript></head><body>x
#script-off
#document
| <!DOCTYPE html>
| <html>
|   <head>
|     <noscript>
|       <style>
|         "p{}"
|   <body>
|     "x"

#data
<!DOCTYPE html><head><noscript><style>p{}</style></noscript></head><body>x
#script-on
#document
| <!DOCTYPE html>
| <html>
|   <head>
|     <noscript>
|       "<style>p{}</style>"
|   <body>
|     "x"

#data
<!DOCTYPE html><noscript><p>break</noscript>
#script-off
#document
| <!DOCTYPE html>
| <html>
|   <head>
|     <noscript>
|   <body>
|     <p>
|       "break"

#data
<!DOCTYPE html><noscript><p>inside</noscript>
#script-on
#document
| <!DOCTYPE html>
| <html>
|   <head>
|     <noscript>
|       "<p>inside"
|   <body>

#data
<!DOCTYPE html><noscript><basefont><bgsound><link><meta>
#script-off
#document
| <!DOCTYPE html>
| <html>
|   <head>
|     <noscript>
|       <basefont>
|       <bgsound>
|       <link>
|       <meta>
|   <body>

#data
<!DOCTYPE html><noscript>  <!--c--><link></noscript>x
#script-off
#document
| <!DOCTYPE html>
| <html>
|   <head>
|     <noscript>
|       "  "
|       <!-- c -->
|       <link>
|   <body>
|     "x"

#data
<!DOCTYPE html><body><noscript><div>a</div></noscript>
#script-off
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <noscript>
|       <div>
|         "a"

#data
<!DOCTYPE html><body><noscript><div>a</div></noscript>
#script-on
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <noscript>
|       "<div>a</div>"

#data
<!DOCTYPE html><body><noscript><noscript>n</noscript></noscript>tail
#script-off
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <noscript>
|       <noscript>
|         "n"
|     "tail"

#data
<!DOCTYPE html><head><noscript><head><body>x
#script-off
#document
| <!DOCTYPE html>
| <html>
|   <head>
|     <noscript>
|   <body>
|     "x"

#data
<!DOCTYPE html><body><noscript><!--<br>--></noscript>
#script-on
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <noscript>
|       "<!--<br>-->"

#data
<!DOCTYPE html><body><noscript><!--<br>--></noscript>
#script-off
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <noscript>
|       <!-- <br> -->

#data
<!DOCTYPE html><isindex name="q" action="/s">text
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <isindex>
|       action="/s"
|       name="q"
|       "text"

#data
<!DOCTYPE html><form><isindex></form>after
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <form>
|       <isindex>
|         "after"

#data
<!DOCTYPE html><menuitem>A<menuitem>B
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <menuitem>
|       "A"
|       <menuitem>
|         "B"

#data
<!DOCTYPE html><li>1<menuitem>m<li>2
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <li>
|       "1"
|       <menuitem>
|         "m"
|     <li>
|       "2"

#data
<!DOCTYPE html><select><menuitem><option>o
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <select>
|       <option>
|         "o"

#data
<!DOCTYPE html><p><isindex>x</p>y
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       <isindex>
|         "x"
|     "y"

#data
<b>x</b><rt>y
#document-fragment
ruby
#document
| <b>
|   "x"
| <rt>
|   "y"

#data
<rb>a<rtc><rt>b
#document-fragment
ruby
#document
| <rb>
|   "a"
|   <rtc>
|     <rt>
|       "b"

#data
<style>s{}</style><p>x
#document-fragment
noscript
#script-off
#document
| <style>
|   "s{}"
| <p>
|   "x"

#data
<!DOCTYPE html><table><tr><td><ruby><rb>a<rt>b</ruby></td></tr></table>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             <ruby>
|               <rb>
|                 "a"
|               <rt>
|                 "b"
"""


# Round-5 family (2): adoption-agency inner/outer-loop depth — a full
# multi-pass run (<a><b><div><div> needs TWO outer-loop passes, clone
# bookkeeping for both a and b), Noah's Ark three-clone cap on
# reconstruction, formatting-vs-ordinary (</b> across <span> pops
# instead of adopting: span is not special), second </b> after afe
# removal ignored; foreign-content/table interplay (foster-parented
# <svg> whose integration point then takes <td> via "clear the stack
# back to a table row context"; <math> fostered out of a table inside
# an mtext integration point); foreign-fragment camelCase and
# integration-point dispatch when the context element is not on the
# stack (adjusted current node, WHATWG §13.4).
DAT11 = r"""
#data
<!DOCTYPE html><p>1<b>2<b>3<b>4<b>5</p><p>x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       "1"
|       <b>
|         "2"
|         <b>
|           "3"
|           <b>
|             "4"
|             <b>
|               "5"
|     <p>
|       <b>
|         <b>
|           <b>
|             "x"

#data
<!DOCTYPE html><a><b><div id="1"><div id="2">x</a>y
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <a>
|       <b>
|     <b>
|       <div>
|         id="1"
|         <a>
|         <div>
|           id="2"
|           <a>
|             "x"
|           "y"

#data
<!DOCTYPE html><i><p><i>1</p>2</i>3
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <i>
|       <p>
|         <i>
|           "1"
|       <i>
|         "2"
|       "3"

#data
<!DOCTYPE html><b><span><b><span>x</b>y</span>z
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <b>
|       <span>
|         <b>
|           <span>
|             "x"
|         "y"
|       "z"

#data
<!DOCTYPE html><table><tr><svg><desc><td>cell
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg desc>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "cell"

#data
<!DOCTYPE html><math><mtext><table><math><mglyph /></math></table></mtext></math>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <math math>
|       <math mtext>
|         <math math>
|           <math mglyph>
|         <table>

#data
<!DOCTYPE html><b>1<p>2</b>3<p>4</b>5
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <b>
|       "1"
|     <p>
|       <b>
|         "2"
|       "3"
|     <p>
|       "45"

#data
<clippath /><textpath /><foreignobject><p>h
#document-fragment
svg svg
#document
| <svg clipPath>
| <svg textPath>
| <svg foreignObject>
|   <p>
|     "h"

#data
<mglyph /><b>x
#document-fragment
math mi
#document
| <math mglyph>
| <b>
|   "x"

#data
<!DOCTYPE html><strike><s>1<strike>2<s>3
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <strike>
|       <s>
|         "1"
|         <strike>
|           "2"
|           <s>
|             "3"
"""




# Round-5 family (3): tricky01/webkit-style formatting stress, the
# data-state NUL matrix (document + fragment contexts), scoping-
# boundary cases (AFE markers at cell/caption closes, list-item scope,
# form pointer, select implied closes), the script-data escaped /
# double-escaped matrix (with style/title as the no-escape contrast),
# and attribute-state edge forms (duplicate names, = / quote / NUL in
# names, unquoted-value '/' consumption).  The multi-iteration adoption-agency case
# (<b>A<cite>B<div>C<address>D</b>E) pins the OUTER loop re-running
# after a successful pass (WHATWG 13.2.6.7 step 19 jumps back to step
# 4: the clone re-found as formatting element, address becomes the
# next furthest block).  The NUL rows pin WHATWG 13.2.5.1 data state
# EMITTING U+0000 and each tree mode deciding: ignored in body/table-
# text/select and at HTML integration points, U+FFFD in foreign
# content — authoring this family found and fixed a tokenizer bug
# (NUL was stripped in the data state, so foreign content never saw
# it).  Comment rows: abrupt-closing <!--> / <!--->, --!> close,
# bogus-comment from <?.  Plus Noah's ark (4th identical <b> evicts
# the oldest), fostered <a> adoption, CRLF normalization in <pre>,
# </br>/</p> synthesis.  Each expectation hand-derived from the spec
# before pinning.
DAT12 = ("""
#data
<b><p>Bold </b> Not bold</p>
#document
| <html>
|   <head>
|   <body>
|     <b>
|     <p>
|       <b>
|         "Bold "
|       " Not bold"

#data
<font color=red><i>Italic and Red<p>Italic and Red </font> Just italic.</p>
#document
| <html>
|   <head>
|   <body>
|     <font>
|       color="red"
|       <i>
|         "Italic and Red"
|     <i>
|       <p>
|         <font>
|           color="red"
|           "Italic and Red "
|         " Just italic."

#data
<p><font size="7">First paragraph.</p><p>Second paragraph.</p></font>
#document
| <html>
|   <head>
|   <body>
|     <p>
|       <font>
|         size="7"
|         "First paragraph."
|     <p>
|       <font>
|         size="7"
|         "Second paragraph."

#data
<html><body><p><b><i><u></p>
<p>X</p></u></i></b></body></html>
#document
| <html>
|   <head>
|   <body>
|     <p>
|       <b>
|         <i>
|           <u>
|     <b>
|       <i>
|         <u>
|           "
"
|           <p>
|             "X"

#data
<b>A<cite>B<div>C<address>D</b>E
#document
| <html>
|   <head>
|   <body>
|     <b>
|       "A"
|       <cite>
|         "B"
|     <div>
|       <b>
|         "C"
|       <address>
|         <b>
|           "D"
|         "E"

#data
x<!-->y
#document
| <html>
|   <head>
|   <body>
|     "x"
|     <!--  -->
|     "y"

#data
x<!--->y
#document
| <html>
|   <head>
|   <body>
|     "x"
|     <!--  -->
|     "y"

#data
<!-- --!>z-->w
#document
| <!--   -->
| <html>
|   <head>
|   <body>
|     "z-->w"

#data
<?php echo ?>t
#document
| <!-- ?php echo ? -->
| <html>
|   <head>
|   <body>
|     "t"

#data
</br>x</p>y
#document
| <html>
|   <head>
|   <body>
|     <br>
|     "x"
|     <p>
|     "y"

#data
<pre>
a
b
c</pre>
#document
| <html>
|   <head>
|   <body>
|     <pre>
|       "a
b
c"

#data
<body>a@NUL@b
#document
| <html>
|   <head>
|   <body>
|     "ab"

#data
<svg>a@NUL@b</svg>
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       "a�b"

#data
<svg><desc>a@NUL@b</desc></svg>
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg desc>
|         "ab"

#data
<math><mtext>a@NUL@b</mtext></math>
#document
| <html>
|   <head>
|   <body>
|     <math math>
|       <math mtext>
|         "ab"

#data
<table>a@NUL@b<td>x</table>
#document
| <html>
|   <head>
|   <body>
|     "ab"
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "x"

#data
<select>a@NUL@b</select>
#document
| <html>
|   <head>
|   <body>
|     <select>
|       "ab"

#data
<table><tr><td></th>x</table>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "x"

#data
<select><option>1<select><option>2
#document
| <html>
|   <head>
|   <body>
|     <select>
|       <option>
|         "1"
|     <option>
|       "2"

#data
<table><colgroup><col><tr><td>x</table>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <colgroup>
|         <col>
|       <tbody>
|         <tr>
|           <td>
|             "x"

#data
<a href="a"><table><a href="b"></table>x
#document
| <html>
|   <head>
|   <body>
|     <a>
|       href="a"
|       <a>
|         href="b"
|       <table>
|     <a>
|       href="b"
|       "x"

#data
<p><b class=x><b class=x><b class=x><b class=x>x</p><p>y
#document
| <html>
|   <head>
|   <body>
|     <p>
|       <b>
|         class="x"
|         <b>
|           class="x"
|           <b>
|             class="x"
|             <b>
|               class="x"
|               "x"
|     <p>
|       <b>
|         class="x"
|         <b>
|           class="x"
|           <b>
|             class="x"
|             "y"

#data
<table>abc<td>def</table>
#document
| <html>
|   <head>
|   <body>
|     "abc"
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "def"


#data
a@NUL@b
#document-fragment
svg path
#document
| "a�b"

#data
a@NUL@b
#document-fragment
svg desc
#document
| "ab"

#data
a@NUL@b<mglyph>c
#document-fragment
math mi
#document
| "ab"
| <math mglyph>
|   "c"

#data
a@NUL@b<table>c@NUL@d</table>
#document-fragment
td
#document
| "abcd"
| <table>

#data
a@NUL@b
#document-fragment
textarea
#document
| "a�b"


#data
<table><tr><td><b>x</td><td>y</td></tr></table>z
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             <b>
|               "x"
|           <td>
|             "y"
|     "z"

#data
<b><table><td>x</table>y
#document
| <html>
|   <head>
|   <body>
|     <b>
|       <table>
|         <tbody>
|           <tr>
|             <td>
|               "x"
|       "y"

#data
<ul><li>a<ul><li>b</li></ul>c</li>d
#document
| <html>
|   <head>
|   <body>
|     <ul>
|       <li>
|         "a"
|         <ul>
|           <li>
|             "b"
|         "c"
|       "d"

#data
<dl><dt>a<dd>b<dt>c</dl>
#document
| <html>
|   <head>
|   <body>
|     <dl>
|       <dt>
|         "a"
|       <dd>
|         "b"
|       <dt>
|         "c"

#data
<p>a<h1>b</h1>c
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "a"
|     <h1>
|       "b"
|     "c"

#data
<h1>a<h2>b
#document
| <html>
|   <head>
|   <body>
|     <h1>
|       "a"
|     <h2>
|       "b"

#data
<form><div><form><input></div>
#document
| <html>
|   <head>
|   <body>
|     <form>
|       <div>
|         <input>

#data
<button>a<button>b
#document
| <html>
|   <head>
|   <body>
|     <button>
|       "a"
|     <button>
|       "b"

#data
<a href="x">1<a href="y">2
#document
| <html>
|   <head>
|   <body>
|     <a>
|       href="x"
|       "1"
|     <a>
|       href="y"
|       "2"

#data
<select><option>a<optgroup>b<option>c</optgroup>d
#document
| <html>
|   <head>
|   <body>
|     <select>
|       <option>
|         "a"
|       <optgroup>
|         "b"
|         <option>
|           "c"
|       "d"

#data
<p><b>1<p>2</b>3
#document
| <html>
|   <head>
|   <body>
|     <p>
|       <b>
|         "1"
|     <p>
|       <b>
|         "2"
|       "3"

#data
<table><caption><b>x</caption>y
#document
| <html>
|   <head>
|   <body>
|     "y"
|     <table>
|       <caption>
|         <b>
|           "x"


#data
<script><!--<script>a</script>--></script>x
#document
| <html>
|   <head>
|     <script>
|       "<!--<script>a</script>-->"
|   <body>
|     "x"

#data
<script><!--a--></script>x
#document
| <html>
|   <head>
|     <script>
|       "<!--a-->"
|   <body>
|     "x"

#data
<script>a<!--b</script>x
#document
| <html>
|   <head>
|     <script>
|       "a<!--b"
|   <body>
|     "x"

#data
<script><!--<script></script>--></script>done
#document
| <html>
|   <head>
|     <script>
|       "<!--<script></script>-->"
|   <body>
|     "done"

#data
<script><!-->a</script>b
#document
| <html>
|   <head>
|     <script>
|       "<!-->a"
|   <body>
|     "b"

#data
<script><!--->a</script>b
#document
| <html>
|   <head>
|     <script>
|       "<!--->a"
|   <body>
|     "b"

#data
<script><!--<script>x--></script>y
#document
| <html>
|   <head>
|     <script>
|       "<!--<script>x-->"
|   <body>
|     "y"

#data
<script><!--</script>after
#document
| <html>
|   <head>
|     <script>
|       "<!--"
|   <body>
|     "after"

#data
<style><!--</style>x
#document
| <html>
|   <head>
|     <style>
|       "<!--"
|   <body>
|     "x"

#data
<title><!--</title>x
#document
| <html>
|   <head>
|     <title>
|       "<!--"
|   <body>
|     "x"


#data
<p id=a id=b CLASS=c>x
#document
| <html>
|   <head>
|   <body>
|     <p>
|       class="c"
|       id="a"
|       "x"

#data
<div/>x</div>y
#document
| <html>
|   <head>
|   <body>
|     <div>
|       "x"
|     "y"

#data
<br/>x<img/><input/>
#document
| <html>
|   <head>
|   <body>
|     <br>
|     "x"
|     <img>
|     <input>

#data
<p a='1'b=2>x
#document
| <html>
|   <head>
|   <body>
|     <p>
|       a="1"
|       b="2"
|       "x"

#data
<p =x =y>t
#document
| <html>
|   <head>
|   <body>
|     <p>
|       =x="y"
|       "t"

#data
<p a"b=1>x
#document
| <html>
|   <head>
|   <body>
|     <p>
|       a"b="1"
|       "x"

#data
<svg><rect ry=1 RX=2/></svg>
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg rect>
|         rx="2/"
|         ry="1"

#data
<p foo>x
#document
| <html>
|   <head>
|   <body>
|     <p>
|       foo=""
|       "x"

#data
<input type=checkbox checked>
#document
| <html>
|   <head>
|   <body>
|     <input>
|       checked=""
|       type="checkbox"

#data
<em a@NUL@b=1>x
#document
| <html>
|   <head>
|   <body>
|     <em>
|       a�b="1"
|       "x"
"""
).strip("\n").replace("@NUL@", "\x00")


# Round-5 family #13: tables01 / blocks / tricky01 / webkit01 corpus
# territory the first 313 did not sample.  Table construction breadth
# (implied colgroup from <col>, thead/tfoot/tbody section ordering and
# the cell-close -> section-close chain, text after a nested table
# landing back in the outer cell, non-whitespace vs whitespace-only
# pending-table-character fostering, <td> interrupting <caption>,
# style-in-table via the in-head rules, character-in-colgroup yielding
# a double colgroup, EOF inside <tr>); block/list interplay (<li>
# closing through an open <div>, nested <form> ignored via the form
# pointer, heading start tag popping an open heading + mismatched
# heading end tag); adoption-agency second-outer-iteration cases
# (trailing text lands in the furthest block, NOT the clone:
# <a>..<button>..</a>, AFE reconstruction across <p> after </tt>,
# <nobr> self-closing via AAA, <xmp> reconstructing formatting);
# after-head/after-body rules (title relocated into head, whitespace
# as a child of <html>, text after </body> merging into the body's
# last text node); the quirks-vs-standards p-in-table twin pair; and
# reference-era "in select" machinery (select-in-select acts as
# </select>, input closes select, optgroup/option implied ends).
# Every expected tree hand-derived from WHATWG 13.2.5/13.2.6 in
# session notes and adjudicated against the engine before pinning
# (the one derivation the engine "contradicted" — trailing text after
# an adopted formatting element — was the derivation's error: AAA's
# OUTER loop runs again because the clone re-enters the AFE at the
# bookmark, finds no furthest block, and pops the clone, so the
# furthest block is the current node afterwards; tricky01's canonical
# "Bold / Not bold" golden in DAT12 pins the same behavior).
DAT13 = r"""
#data
<table><col width=20><tbody><tr><td>x
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <colgroup>
|         <col>
|           width="20"
|       <tbody>
|         <tr>
|           <td>
|             "x"

#data
<table><thead><tr><th>h<tfoot><tr><td>f<tbody><tr><td>b</table>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <thead>
|         <tr>
|           <th>
|             "h"
|       <tfoot>
|         <tr>
|           <td>
|             "f"
|       <tbody>
|         <tr>
|           <td>
|             "b"

#data
<table><tr><td><table><tr><td>inner</table>outer</table>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             <table>
|               <tbody>
|                 <tr>
|                   <td>
|                     "inner"
|             "outer"

#data
<table>x<td>y</table>z
#document
| <html>
|   <head>
|   <body>
|     "x"
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "y"
|     "z"

#data
<table> <tr> <td>a</table>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       " "
|       <tbody>
|         <tr>
|           " "
|           <td>
|             "a"

#data
<table><caption>cap<td>x</table>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <caption>
|         "cap"
|       <tbody>
|         <tr>
|           <td>
|             "x"

#data
<a>1<button>2</a>3</button>
#document
| <html>
|   <head>
|   <body>
|     <a>
|       "1"
|     <button>
|       <a>
|         "2"
|       "3"

#data
<dl><dt><b>x<dd>y</b>z</dl>
#document
| <html>
|   <head>
|   <body>
|     <dl>
|       <dt>
|         <b>
|           "x"
|       <dd>
|         <b>
|           "y"
|         "z"

#data
<table><style>x</style><tr><td>y</table>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <style>
|         "x"
|       <tbody>
|         <tr>
|           <td>
|             "y"

#data
<select><option>1<optgroup><option>2</optgroup><option>3</select>
#document
| <html>
|   <head>
|   <body>
|     <select>
|       <option>
|         "1"
|       <optgroup>
|         <option>
|           "2"
|       <option>
|         "3"

#data
<nobr>1<nobr>2</nobr>3
#document
| <html>
|   <head>
|   <body>
|     <nobr>
|       "1"
|     <nobr>
|       "2"
|     "3"

#data
<p><b>x<xmp>y</xmp>
#document
| <html>
|   <head>
|   <body>
|     <p>
|       <b>
|         "x"
|     <b>
|       <xmp>
|         "y"

#data
<script>x
#document
| <html>
|   <head>
|     <script>
|       "x"
|   <body>

#data
<table><thead><tr><th>1<tbody><tr><td>2</table>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <thead>
|         <tr>
|           <th>
|             "1"
|       <tbody>
|         <tr>
|           <td>
|             "2"

#data
<body>x</body>y
#document
| <html>
|   <head>
|   <body>
|     "xy"

#data
<head></head><title>t</title><body>
#document
| <html>
|   <head>
|     <title>
|       "t"
|   <body>

#data
<head></head> <body>x
#document
| <html>
|   <head>
|   " "
|   <body>
|     "x"

#data
<tt><i><b>x</tt><p>y
#document
| <html>
|   <head>
|   <body>
|     <tt>
|       <i>
|         <b>
|           "x"
|     <p>
|       <i>
|         <b>
|           "y"

#data
<h1>a<h3>b</h3>c</h1>
#document
| <html>
|   <head>
|   <body>
|     <h1>
|       "a"
|     <h3>
|       "b"
|     "c"

#data
<ul><li>a<div><li>b</ul>
#document
| <html>
|   <head>
|   <body>
|     <ul>
|       <li>
|         "a"
|         <div>
|       <li>
|         "b"

#data
<form><div><form>x
#document
| <html>
|   <head>
|   <body>
|     <form>
|       <div>
|         "x"

#data
<table><tr>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>

#data
<table><colgroup>x<col>
#document
| <html>
|   <head>
|   <body>
|     "x"
|     <table>
|       <colgroup>
|       <colgroup>
|         <col>

#data
<p><b><div>x
#document
| <html>
|   <head>
|   <body>
|     <p>
|       <b>
|     <div>
|       <b>
|         "x"

#data
<!DOCTYPE html><p>1<table><tr><td>2</table>3
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       "1"
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "2"
|     "3"

#data
<p>1<table><tr><td>2</table>3
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "1"
|       <table>
|         <tbody>
|           <tr>
|             <td>
|               "2"
|       "3"

#data
<select>a<select>b
#document
| <html>
|   <head>
|   <body>
|     <select>
|       "a"
|     "b"

#data
<select><option>a<input>b
#document
| <html>
|   <head>
|   <body>
|     <select>
|       <option>
|         "a"
|     <input>
|     "b"

#data
<table><colgroup><col><td>x</table>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <colgroup>
|         <col>
|       <tbody>
|         <tr>
|           <td>
|             "x"

#data
<table><caption><b>x</table>y
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <caption>
|         <b>
|           "x"
|     "y"
"""


# Round-5 family #14: scoping markers, stray table tags, and tokenizer
# edges.  Table cells push an active-formatting MARKER, so formatting
# open in one cell neither leaks into the next cell nor answers a stray
# end tag there; cell close generates implied end tags (open <button>);
# stray td/tr/caption in body are ignored outright.  Nested <a> and
# <button> trigger their own implied-close rules (AAA simple case /
# button-scope pop).  Foreign content honors the self-closing flag
# (<svg><script/>, <math><script/>) where HTML ignores it (<div/>).
# Document-level placement: comment before doctype, EOF-in-comment,
# whitespace before <html> dropped, <frameset> ignored once body has
# non-whitespace text (frameset-ok flag).  Tokenizer attribute rules:
# duplicate attribute keeps the FIRST value, names are lowercased but
# values keep case.  Every expectation hand-derived from WHATWG
# 13.2.5/13.2.6 and adjudicated against the engine before pinning.
DAT14 = r"""
#data
<table><tr><td><b>x<td>y</table>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             <b>
|               "x"
|           <td>
|             "y"

#data
<table><tr><td><button>1<td>2</table>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             <button>
|               "1"
|           <td>
|             "2"

#data
<td><tr><caption>x
#document
| <html>
|   <head>
|   <body>
|     "x"

#data
<a>1<a>2</a>3
#document
| <html>
|   <head>
|   <body>
|     <a>
|       "1"
|     <a>
|       "2"
|     "3"

#data
<button>1<button>2
#document
| <html>
|   <head>
|   <body>
|     <button>
|       "1"
|     <button>
|       "2"

#data
<svg><script/>y
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg script>
|       "y"

#data
<div/>x
#document
| <html>
|   <head>
|   <body>
|     <div>
|       "x"

#data
<!--c--><!DOCTYPE html><p>x
#document
| <!-- c -->
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       "x"

#data
<!--x
#document
| <!-- x -->
| <html>
|   <head>
|   <body>

#data
<p id=a id=b>x
#document
| <html>
|   <head>
|   <body>
|     <p>
|       id="a"
|       "x"

#data
<p ID=A>x
#document
| <html>
|   <head>
|   <body>
|     <p>
|       id="A"
|       "x"

#data
  <html><body>x
#document
| <html>
|   <head>
|   <body>
|     "x"

#data
<body>x<frameset>
#document
| <html>
|   <head>
|   <body>
|     "x"

#data
<table><tr><td>1</b>2</table>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "12"

#data
<math><script/>y
#document
| <html>
|   <head>
|   <body>
|     <math math>
|       <math script>
|       "y"
"""


# Round-5 family #15: tests12/15/19/22 corpus territory.  Heading end
# tag popping an open <a> that then reconstructs (tests22), formatting
# reconstruction across <li>s and after </p> with the <b> left in the
# AFE, CDATA bracket-run counting (]] before the ]]> close), <main> in
# the close-a-p set, HTML re-entry inside <foreignObject> spawning a
# fresh foreign root, <noframes> RAWTEXT while still "in head", EOF in
# foreign content, implied <p> closes inside a cell, the AAA
# no-furthest-block simple case popping ORDINARY unknown elements
# above the formatting element, and <wbr> as a void element.
# Attribute-namespace rows pin a real round-5 dump bug found while
# authoring this family: xml:/xlink:/xmlns attributes are namespaced
# ONLY on foreign elements ("adjust foreign attributes", WHATWG
# 13.2.6.2) — on HTML elements the same spelling is a literal
# attribute name and dumps verbatim (xml:lang="en" / xmlns:v="urn"),
# where the dump previously emitted the foreign two-token form for
# both (dom/treedump.py _attr_line now takes the element namespace).
DAT15 = r"""
#data
<h1><a>x</h1>y
#document
| <html>
|   <head>
|   <body>
|     <h1>
|       <a>
|         "x"
|     <a>
|       "y"

#data
<ul><li><b>1<li>2</ul>
#document
| <html>
|   <head>
|   <body>
|     <ul>
|       <li>
|         <b>
|           "1"
|       <li>
|         <b>
|           "2"

#data
<p><b></p>x
#document
| <html>
|   <head>
|   <body>
|     <p>
|       <b>
|     <b>
|       "x"

#data
<svg><![CDATA[a]]]]>b</svg>
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       "a]]b"

#data
<p xml:lang=en>x
#document
| <html>
|   <head>
|   <body>
|     <p>
|       xml:lang="en"
|       "x"

#data
<html xmlns:v=urn><p xmlns=w>
#document
| <html>
|   xmlns:v="urn"
|   <head>
|   <body>
|     <p>
|       xmlns="w"

#data
<svg xlink:href=u xml:lang=en><circle/>
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       xlink href="u"
|       xml lang="en"
|       <svg circle>

#data
<p>a<main>b
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "a"
|     <main>
|       "b"

#data
<svg><g><foreignObject><p>x<svg><circle>
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg g>
|         <svg foreignObject>
|           <p>
|             "x"
|             <svg svg>
|               <svg circle>

#data
<noframes>x</noframes>y
#document
| <html>
|   <head>
|     <noframes>
|       "x"
|   <body>
|     "y"

#data
<svg><g>
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg g>

#data
<table><tr><td><p>1<p>2</table>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             <p>
|               "1"
|             <p>
|               "2"

#data
<b><em><foo><bar>x</em>y
#document
| <html>
|   <head>
|   <body>
|     <b>
|       <em>
|         <foo>
|           <bar>
|             "x"
|       "y"

#data
<wbr>x<wbr>
#document
| <html>
|   <head>
|   <body>
|     <wbr>
|     "x"
|     <wbr>
"""


# Round-5 family #16: adoption02 / pending-spec-changes territory.
# The AAA inner-loop clone case (<b>1<i>2<p>3</b>4: <i> is cloned,
# the <p> moves into the clone, and the trailing text lands in the
# furthest block next to the <b> clone); the frameset-ok flag matrix
# for <input> (type=hidden preserves it, so a later <frameset>
# REPLACES the body; any other type clears it); a cell's AFE marker
# blocking </b> from reaching a formatting element opened before the
# table, with the text after </table> continuing INSIDE that still-
# open <b>; "any other end tag" aborting at a special element
# (</span> ignored when <button> is current); text between table
# rows fostering while <td> re-opens a fresh <tr>; and nested-list
# implied ends.  Every expectation hand-derived from WHATWG
# 13.2.6.4.7/13.2.6.4.9-13 and adjudicated against the engine before
# pinning.
DAT16 = r"""
#data
<b>1<i>2<p>3</b>4
#document
| <html>
|   <head>
|   <body>
|     <b>
|       "1"
|       <i>
|         "2"
|     <i>
|       <p>
|         <b>
|           "3"
|         "4"

#data
<!DOCTYPE html><input type="hidden"><frameset>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <frameset>

#data
<!DOCTYPE html><input type="text"><frameset>
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <input>
|       type="text"

#data
<b>a<table><tr><td></b>b</td></tr></table>c
#document
| <html>
|   <head>
|   <body>
|     <b>
|       "a"
|       <table>
|         <tbody>
|           <tr>
|             <td>
|               "b"
|       "c"

#data
<p>a<center>b
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "a"
|     <center>
|       "b"

#data
<span><button>x</span>y
#document
| <html>
|   <head>
|   <body>
|     <span>
|       <button>
|         "xy"

#data
<table><tr></tr>x<td>y</table>
#document
| <html>
|   <head>
|   <body>
|     "x"
|     <table>
|       <tbody>
|         <tr>
|         <tr>
|           <td>
|             "y"

#data
<ol><li>1<ol><li>2</ol>3</ol>4
#document
| <html>
|   <head>
|   <body>
|     <ol>
|       <li>
|         "1"
|         <ol>
|           <li>
|             "2"
|         "3"
|     "4"
"""


# Round-5 family #17: Noah's Ark is ATTRIBUTE-sensitive (WHATWG
# 13.2.6.3 "push onto the list of active formatting elements":
# "same tag name, namespace, and attributes" — a 4th <b> with a
# different class is kept; attribute ORDER is irrelevant to the
# comparison; eviction removes from the LIST only, so the source
# <p> keeps all four elements while reconstruction yields three);
# multi-codepoint named character references (&NotEqualTilde; =>
# U+2242 U+0338, &fjlig; => "fj", &ThickSpace; => U+205F U+200A,
# per the WHATWG named-references table) and the ambiguous-ampersand
# literal passthrough (&xyzzy;); "adjust foreign attributes"
# (13.2.6.2) as a FIXED table of qualified names — xlink:href/
# xml:base/xmlns/xmlns:xlink are namespaced on foreign elements but
# xlink:foo/xml:foo/xmlns:foo stay literal attribute names (authoring
# this family found and fixed a dump bug: any xlink:/xml:/xmlns:
# prefix was namespaced); prefixed element names are literal both in
# HTML content (<html:div>) and as unadjusted foreign start tags
# (<html:path> inside <svg>); and the foreign-content "any other end
# tag" walk reaching an HTML <a> and running the adoption agency
# with NO furthest block (plain svg/tr/input are not in the special
# category), popping everything to the formatting element.
DAT17 = r"""
#data
<p><b class=x><b class=x><b class=x><b class=y>x</p><p>y
#document
| <html>
|   <head>
|   <body>
|     <p>
|       <b>
|         class="x"
|         <b>
|           class="x"
|           <b>
|             class="x"
|             <b>
|               class="y"
|               "x"
|     <p>
|       <b>
|         class="x"
|         <b>
|           class="x"
|           <b>
|             class="x"
|             <b>
|               class="y"
|               "y"

#data
<p><b class=x><b class=x><b class=x><b class=x>x</p><p>y
#document
| <html>
|   <head>
|   <body>
|     <p>
|       <b>
|         class="x"
|         <b>
|           class="x"
|           <b>
|             class="x"
|             <b>
|               class="x"
|               "x"
|     <p>
|       <b>
|         class="x"
|         <b>
|           class="x"
|           <b>
|             class="x"
|             "y"

#data
<p><b a=1 b=2><b b=2 a=1><b a=1 b=2><b b=2 a=1>x</p><p>y
#document
| <html>
|   <head>
|   <body>
|     <p>
|       <b>
|         a="1"
|         b="2"
|         <b>
|           a="1"
|           b="2"
|           <b>
|             a="1"
|             b="2"
|             <b>
|               a="1"
|               b="2"
|               "x"
|     <p>
|       <b>
|         a="1"
|         b="2"
|         <b>
|           a="1"
|           b="2"
|           <b>
|             a="1"
|             b="2"
|             "y"

#data
<p>&NotEqualTilde;&CounterClockwiseContourIntegral;&fjlig;
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "≂̸∳fj"

#data
<p>&ngE;&xyzzy;&ThickSpace;z
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "≧̸&xyzzy;  z"

#data
<svg xmlns="http://www.w3.org/2000/svg" xmlns:xlink="http://www.w3.org/1999/xlink"><g xlink:href="#a"/></svg>
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       xmlns xmlns="http://www.w3.org/2000/svg"
|       xmlns xlink="http://www.w3.org/1999/xlink"
|       <svg g>
|         xlink href="#a"

#data
<svg xlink:foo=1 xml:foo=2 xmlns:foo=3 xlink:href=4 xml:base=5></svg>
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       xlink:foo="1"
|       xlink href="4"
|       xml base="5"
|       xml:foo="2"
|       xmlns:foo="3"

#data
<math xmlns:xlink="http://www.w3.org/1999/xlink" xml:space=preserve><mi xml:id=a>
#document
| <html>
|   <head>
|   <body>
|     <math math>
|       xml space="preserve"
|       xmlns xlink="http://www.w3.org/1999/xlink"
|       <math mi>
|         xml:id="a"

#data
<html:div><svg><html:path/></svg>
#document
| <html>
|   <head>
|   <body>
|     <html:div>
|       <svg svg>
|         <svg html:path>

#data
<a><svg><tr><input></a>
#document
| <html>
|   <head>
|   <body>
|     <a>
|       <svg svg>
|         <svg tr>
|           <svg input>
"""


# Round-5 family #18: CDATA-section tokenizer edges in foreign content
# (WHATWG 13.2.5.69-71: empty section, "]]" inside the payload via the
# bracket/end-state reconsume rule, EOF inside the section and in the
# end state) vs the HTML-content bogus-comment form (<![CDATA[x]]> in
# a <p> becomes a comment whose data includes the brackets); the
# DOCTYPE tokenizer edge matrix (missing whitespace before the name,
# missing-quote-after-PUBLIC dropping both ids, junk after a complete
# system id taking the bogus-DOCTYPE path but KEEPING the id,
# public-id-only and nameless forms — dumped in the corpus's
# empty-string quoting convention); and template/table interplay
# (template inserted IN the table without fostering via the in-head
# rules, td inside template content via the template insertion-mode
# stack stopping "clear to table-row context" at the template, and
# non-whitespace table text after </template> fostering before the
# table while the template kept its content).  Every expectation
# hand-derived from WHATWG 13.2.5/13.2.6 before pinning.
DAT18 = r"""
#data
<svg><![CDATA[]]></svg>x
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|     "x"

#data
<svg><![CDATA[a]]b]]></svg>
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       "a]]b"

#data
<svg><![CDATA[a
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       "a"

#data
<svg><![CDATA[a]]
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       "a]]"

#data
<p><![CDATA[x]]>
#document
| <html>
|   <head>
|   <body>
|     <p>
|       <!-- [CDATA[x]] -->

#data
<!DOCTYPEhtml><p>x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       "x"

#data
<!DOCTYPE html PUBLIC><p>x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       "x"

#data
<!DOCTYPE html SYSTEM 'x' junk><p>x
#document
| <!DOCTYPE html "" "x">
| <html>
|   <head>
|   <body>
|     <p>
|       "x"

#data
<!DOCTYPE html PUBLIC "a" "b" ><p>x
#document
| <!DOCTYPE html "a" "b">
| <html>
|   <head>
|   <body>
|     <p>
|       "x"

#data
<!DOCTYPE html PUBLIC "a"><p>x
#document
| <!DOCTYPE html "a" "">
| <html>
|   <head>
|   <body>
|     <p>
|       "x"

#data
<!DOCTYPE ><p>x
#document
| <!DOCTYPE >
| <html>
|   <head>
|   <body>
|     <p>
|       "x"

#data
<table><template><tr><td>a</td></tr></template></table>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <template>
|         content
|           <tr>
|             <td>
|               "a"

#data
<table><tr><template><td>x</td></template></tr></table>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <template>
|             content
|               <td>
|                 "x"

#data
<table><template>x</template>y</table>
#document
| <html>
|   <head>
|   <body>
|     "y"
|     <table>
|       <template>
|         content
|           "x"

#data
<body><template><frame></template>
#document
| <html>
|   <head>
|   <body>
|     <template>
|       content
"""


# Round-5 family #19: select/optgroup implied-end machinery (in-select
# optgroup pops an open option AND a current optgroup; in-BODY option/
# optgroup only pop an open option, so <option> nests inside an open
# <optgroup>); the after-head routing rules (whitespace goes into the
# <html> element while link/title/base re-enter the HEAD via the
# in-head rules — the head element pointer); the after-frameset /
# after-after-frameset states (whitespace kept, non-whitespace
# dropped, comments land on <html> vs the Document); a table nested
# inside <caption> (inner </table> resets the insertion mode back to
# "in caption" via reset-the-insertion-mode, text after </caption>
# fostering before the OUTER table only); and the reference-era
# in-select "anything else: ignore" legacy for table/tr start tags.
# Every expectation hand-derived from WHATWG 13.2.6.4.6/.4.16/.4.19-22
# (with the documented reference-era select deviation) before pinning.
DAT19 = r"""
#data
<select><optgroup><option>a</optgroup><option>b<optgroup><option>c
#document
| <html>
|   <head>
|   <body>
|     <select>
|       <optgroup>
|         <option>
|           "a"
|       <option>
|         "b"
|       <optgroup>
|         <option>
|           "c"

#data
<select><option>a<option>b</select>x
#document
| <html>
|   <head>
|   <body>
|     <select>
|       <option>
|         "a"
|       <option>
|         "b"
|     "x"

#data
<option>a<option>b<optgroup>c<option>d
#document
| <html>
|   <head>
|   <body>
|     <option>
|       "a"
|     <option>
|       "b"
|     <optgroup>
|       "c"
|       <option>
|         "d"

#data
</head> <link><p>x
#document
| <html>
|   <head>
|     <link>
|   " "
|   <body>
|     <p>
|       "x"

#data
<head></head><title>t</title><p>x
#document
| <html>
|   <head>
|     <title>
|       "t"
|   <body>
|     <p>
|       "x"

#data
<head></head><base href=a><body>x
#document
| <html>
|   <head>
|     <base>
|       href="a"
|   <body>
|     "x"

#data
<frameset><frame></frameset> x<!--c--><p>
#document
| <html>
|   <head>
|   <frameset>
|     <frame>
|   " "
|   <!-- c -->

#data
<frameset></frameset></html> <!--c-->x
#document
| <html>
|   <head>
|   <frameset>
|   " "
| <!-- c -->

#data
<table><caption>a<table><tr><td>b</table>c</caption>d</table>e
#document
| <html>
|   <head>
|   <body>
|     "d"
|     <table>
|       <caption>
|         "a"
|         <table>
|           <tbody>
|             <tr>
|               <td>
|                 "b"
|         "c"
|     "e"

#data
<select><table><tr>x
#document
| <html>
|   <head>
|   <body>
|     <select>
|       "x"
"""


# Round-5 family #20: the a-in-a implicit adoption run (a second <a>
# start tag triggers the agency for the OPEN one, with no furthest
# block inside <p>, then both reconstruct on either side of </p>);
# button-scope (a second <button> implies </button> through an open
# <p>); the rawtext trio noembed/iframe/xmp taking markup literally;
# AAA furthest-block selection (an unknown element is NOT special, so
# <foo><bar> under the formatting chain give no furthest block and
# the simple pop path runs, while <aside> IS special and the full
# agency reparents it — with trailing text landing in the furthest
# block, not the clone, per the adoption01 convention pinned in
# earlier families); a stray </li> with no list item in scope; dt/dd
# implied-end chains; and the tricky01 interleaved <s>/<b> double
# reconstruction.  Every expectation hand-derived from WHATWG
# 13.2.6.4.7/13.2.6.7 before pinning.
DAT20 = r"""
#data
<a href=a>1<p>2<a href=b>3</p>4
#document
| <html>
|   <head>
|   <body>
|     <a>
|       href="a"
|       "1"
|     <p>
|       <a>
|         href="a"
|         "2"
|       <a>
|         href="b"
|         "3"
|     <a>
|       href="b"
|       "4"

#data
<button>1<p>2<button>3
#document
| <html>
|   <head>
|   <body>
|     <button>
|       "1"
|       <p>
|         "2"
|     <button>
|       "3"

#data
<noembed><b>x</noembed><b>y
#document
| <html>
|   <head>
|   <body>
|     <noembed>
|       "<b>x"
|     <b>
|       "y"

#data
<iframe>a</iframe>b
#document
| <html>
|   <head>
|   <body>
|     <iframe>
|       "a"
|     "b"

#data
<xmp><b>x</xmp>y
#document
| <html>
|   <head>
|   <body>
|     <xmp>
|       "<b>x"
|     "y"

#data
<b><em><foo><aside>x</b>y
#document
| <html>
|   <head>
|   <body>
|     <b>
|       <em>
|         <foo>
|     <em>
|       <aside>
|         <b>
|           "x"
|         "y"

#data
<b><em><foo><bar>x</b>y
#document
| <html>
|   <head>
|   <body>
|     <b>
|       <em>
|         <foo>
|           <bar>
|             "x"
|     <em>
|       "y"

#data
<li>a<li>b</li></li>c
#document
| <html>
|   <head>
|   <body>
|     <li>
|       "a"
|     <li>
|       "b"
|     "c"

#data
<dl><dt>a<dd>b<dt>c</dl>d
#document
| <html>
|   <head>
|   <body>
|     <dl>
|       <dt>
|         "a"
|       <dd>
|         "b"
|       <dt>
|         "c"
|     "d"

#data
<p>1<s id=A>2<b id=B>3</p>4</s>5</b>6
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "1"
|       <s>
|         id="A"
|         "2"
|         <b>
|           id="B"
|           "3"
|     <s>
|       id="A"
|       <b>
|         id="B"
|         "4"
|     <b>
|       id="B"
|       "5"
|     "6"
"""


# Round-5 family #21: foreign-content tokenization is NEVER rawtext —
# <script> inside <svg> holds child text until </script> pops it by
# the foreign end-tag rule, and <b> (a breakout tag) pops the whole
# foreign stack mid-script while <style> (not in the breakout list)
# stays foreign; EOF truncation forms (a bare "<" and "a&" flush as
# literal text; EOF inside an attribute value or tag name drops the
# whole token); and the attribute-name tokenizer error-recovery
# matrix ("=" starting an attribute name, "<" kept in a name,
# quote-then-name with missing whitespace, "=" inside an unquoted
# value, '"' kept in a name, and "/" without ">" rejoining
# before-attribute-name without self-closing).  Every expectation
# hand-derived from WHATWG 13.2.5.32-40/13.2.6.5 before pinning.
DAT21 = r"""
#data
<svg><script>a<b>c</script>d</svg>e
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg script>
|         "a"
|     <b>
|       "cde"

#data
<svg><style>a{}</style>b</svg>
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg style>
|         "a{}"
|       "b"

#data
<p><
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "<"

#data
<p>a&
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "a&"

#data
<p><a href="x
#document
| <html>
|   <head>
|   <body>
|     <p>

#data
<table><td
#document
| <html>
|   <head>
|   <body>
|     <table>

#data
<p =x>y
#document
| <html>
|   <head>
|   <body>
|     <p>
|       =x=""
|       "y"

#data
<p <p>y
#document
| <html>
|   <head>
|   <body>
|     <p>
|       <p=""
|       "y"

#data
<p a='b'c=d>y
#document
| <html>
|   <head>
|   <body>
|     <p>
|       a="b"
|       c="d"
|       "y"

#data
<p a=b=c>y
#document
| <html>
|   <head>
|   <body>
|     <p>
|       a="b=c"
|       "y"

#data
<p a"b=c>y
#document
| <html>
|   <head>
|   <body>
|     <p>
|       a"b="c"
|       "y"

#data
<p/ a=b>y
#document
| <html>
|   <head>
|   <body>
|     <p>
|       a="b"
|       "y"
"""


# Round-5 family #22: fragment contexts the earlier families did not
# sample.  frameset context ("in frameset": non-whitespace characters
# dropped, whitespace kept, nested <frameset>/<frame> inserted,
# <noframes> via the in-head rules); head context (pure head
# machinery: RCDATA title, void link/meta, rawtext style); caption
# context (the in-caption fragment guards: td and </caption> both
# ignored when no caption is in table scope); option context (resets
# to "in body": a second <option> pops the open one); select context
# (a nested <select> start tag acts as </select>, which the fragment
# guard ignores); body context (</body> ignored with no body in
# scope — text continues at the root); and the reset-the-insertion-
# mode nuance that ONLY td/th carry the "last is false" condition —
# a td context falls through to "in body" where stray tr/td/</table>
# are ignored, while a colgroup context unconditionally selects
# "in column group" where <col> inserts and <tr> hits the fragment
# guard.  Every expectation hand-derived from WHATWG 13.4 +
# 13.2.6.4.6-22 before pinning.
DAT22 = r"""
#data
<frame>x<frameset>
#document-fragment
frameset
#document
| <frame>
| <frameset>

#data
<noframes>x</noframes> <frame>
#document-fragment
frameset
#document
| <noframes>
|   "x"
| " "
| <frame>

#data
<title>t</title><link><meta charset=utf-8><style>a{}</style>
#document-fragment
head
#document
| <title>
|   "t"
| <link>
| <meta>
|   charset="utf-8"
| <style>
|   "a{}"

#data
<td>a</caption>b
#document-fragment
caption
#document
| "ab"

#data
a<option>b<option>c
#document-fragment
option
#document
| "a"
| <option>
|   "b"
| <option>
|   "c"

#data
<select>x<option>y
#document-fragment
select
#document
| "x"
| <option>
|   "y"

#data
x</body><!--c-->y
#document-fragment
body
#document
| "x"
| <!-- c -->
| "y"

#data
<tr><td>a</table>b
#document-fragment
td
#document
| "ab"

#data
<col><tr>
#document-fragment
colgroup
#document
| <col>
"""


# Round-5 family #23: script-data escape permutations beyond the DAT14
# matrix (an inner </script> leaving the DOUBLE-escaped state while
# the outer close is still honored; --> exiting double-escape; an
# escaped block followed by a literal dash-run before the real
# close); RCDATA entity-vs-tag semantics (&amp; decodes while <b>
# stays literal in <title>; entities decode in <textarea> and ONLY
# the first newline after the start tag is dropped); an unterminated
# comment flushed at EOF with its partial data; comment dash-run
# forms (--- between dashes, the five-dash <!-----> keeping one dash
# of data, the four-dash empty comment); and an SVG foreignObject
# HTML integration point where </foreignObject> is IGNORED because
# the any-other-end-tag walk reaches special <p> first — the
# trailing text stays inside the paragraph.  Every expectation
# hand-derived from WHATWG 13.2.5.44-52 (comment states),
# 13.2.5.15-32 (script data), 13.2.6.5 before pinning.
DAT23 = r"""
#data
<script><!--<script></script>-->x</script>y
#document
| <html>
|   <head>
|     <script>
|       "<!--<script></script>-->x"
|   <body>
|     "y"

#data
<script><!--<script>--></script>x
#document
| <html>
|   <head>
|     <script>
|       "<!--<script>-->"
|   <body>
|     "x"

#data
<script><!-- - --> ---></script>
#document
| <html>
|   <head>
|     <script>
|       "<!-- - --> --->"
|   <body>

#data
<title>&amp;<b></title>x
#document
| <html>
|   <head>
|     <title>
|       "&<b>"
|   <body>
|     "x"

#data
<textarea>&lt;b&gt;
x</textarea>
#document
| <html>
|   <head>
|   <body>
|     <textarea>
|       "<b>
x"

#data
<textarea>

x</textarea>
#document
| <html>
|   <head>
|   <body>
|     <textarea>
|       "
x"

#data
<p>x<!-- y
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "x"
|       <!--  y -->

#data
<!-- a -- b -->z
#document
| <!--  a -- b  -->
| <html>
|   <head>
|   <body>
|     "z"

#data
<!----->z
#document
| <!-- - -->
| <html>
|   <head>
|   <body>
|     "z"

#data
<!---->z
#document
| <!--  -->
| <html>
|   <head>
|   <body>
|     "z"

#data
<svg><foreignObject><p>a<table><tr><td>b</table></foreignObject>c
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg foreignObject>
|         <p>
|           "a"
|           <table>
|             <tbody>
|               <tr>
|                 <td>
|                   "b"
|           "c"
"""


# Round-5 family #24: </caption> reached from inside foreign content
# (the foreign end-tag walk hands off to "in caption" at the first
# HTML ancestor); comment tokens in table contexts flush pending
# fostered characters but are NOT themselves fostered (comments land
# in table/tr/td); td directly in <thead> synthesizing a <tr>; a
# second <tbody> clearing back to table context (siblings, not
# nesting); EOF inside an open template (tr in template content maps
# to "in table body" with NO tbody synthesis — the template is the
# clear boundary); self-closing ignored on an HTML <div>; and
# <caption> inside a select-in-table popping the select, closing the
# cell, and clearing to table context.  Every expectation
# hand-derived from WHATWG 13.2.6.4.9-17 before pinning.
DAT24 = r"""
#data
<table><caption><svg>x</caption>y</table>
#document
| <html>
|   <head>
|   <body>
|     "y"
|     <table>
|       <caption>
|         <svg svg>
|           "x"

#data
<table>x<!--c--></table>
#document
| <html>
|   <head>
|   <body>
|     "x"
|     <table>
|       <!-- c -->

#data
<table><!--a--><tr><!--b--><td><!--c--></table>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <!-- a -->
|       <tbody>
|         <tr>
|           <!-- b -->
|           <td>
|             <!-- c -->

#data
<table><thead><td>x</table>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <thead>
|         <tr>
|           <td>
|             "x"

#data
<table><tbody><tbody><tr><td>x</table>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|       <tbody>
|         <tr>
|           <td>
|             "x"

#data
<template><tr><td>x
#document
| <html>
|   <head>
|     <template>
|       content
|         <tr>
|           <td>
|             "x"
|   <body>

#data
<div/>x</div>y
#document
| <html>
|   <head>
|   <body>
|     <div>
|       "x"
|     "y"

#data
<table><tr><td><select><caption>x</table>y
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             <select>
|       <caption>
|         "x"
|     "y"
"""


# Round-5 family #25: in-column-group text handling (whitespace kept
# inside the colgroup, non-whitespace popping it and fostering, a
# later <col> opening a SECOND colgroup); th closed by td through the
# in-cell rules; a second <caption> closing the first and clearing
# the AFE marker; </html> from in-body reaching after-after-body and
# a later character re-entering in-body (so the following comment
# lands in <body>, not on the Document); a repeated <head> ignored
# in after-head; a DOCTYPE after character data ignored (quirks); and
# the namespace-dispatch contrast pair — <math> inside <svg> and
# <svg> inside <math> inherit the ADJUSTED CURRENT NODE's namespace
# (no re-dispatch outside integration points), while <svg> at an
# mtext TEXT integration point goes through the in-body rules and
# gets the real SVG namespace.  Every expectation hand-derived from
# WHATWG 13.2.6.4.12/.4.11/.4.19/13.2.6.5 before pinning.
DAT25 = r"""
#data
<table><colgroup> <col>x<col></table>y
#document
| <html>
|   <head>
|   <body>
|     "x"
|     <table>
|       <colgroup>
|         " "
|         <col>
|       <colgroup>
|         <col>
|     "y"

#data
<table><tr><th>a<td>b</table>
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <th>
|             "a"
|           <td>
|             "b"

#data
<table><caption>a<caption>b</table>c
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <caption>
|         "a"
|       <caption>
|         "b"
|     "c"

#data
<body>x</html>y<!--c-->
#document
| <html>
|   <head>
|   <body>
|     "xy"
|     <!-- c -->

#data
<head></head><head>x
#document
| <html>
|   <head>
|   <body>
|     "x"

#data
x<!DOCTYPE html><p>y
#document
| <html>
|   <head>
|   <body>
|     "x"
|     <p>
|       "y"

#data
<svg><math><mi>x
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg math>
|         <svg mi>
|           "x"

#data
<math><svg>x
#document
| <html>
|   <head>
|   <body>
|     <math math>
|       <math svg>
|         "x"

#data
<math><mtext><svg>x</svg></mtext>y
#document
| <html>
|   <head>
|   <body>
|     <math math>
|       <math mtext>
|         <svg svg>
|           "x"
|       "y"
"""


# Round-5 family #26: the form element pointer lifecycle — a nested
# <form> is ignored while the pointer is set, EXCEPT inside template
# content (the template-on-stack escape hatch, which also leaves the
# pointer untouched so a form after </template> still works); </form>
# clears the pointer so a sibling form inserts; a second <select>
# inside an open select acts as </select> and pops the OUTER one (the
# next option lands in body); the era void set basefont/bgsound (in
# head) and wbr/keygen (in body) inserting without children; and the
# in-table <form> special case (insert then pop immediately — the
# form stays empty inside the table while following text fosters, and
# the later </form> finds its pointer element already off the
# stack).  Every expectation hand-derived from WHATWG 13.2.6.4.7/.4.9
# (reference-era void list) before pinning.
DAT26 = r"""
#data
<form>a<template><form>b</form></template>c
#document
| <html>
|   <head>
|   <body>
|     <form>
|       "a"
|       <template>
|         content
|           <form>
|             "b"
|       "c"

#data
<form>a<form>b
#document
| <html>
|   <head>
|   <body>
|     <form>
|       "ab"

#data
<form></form><form>x
#document
| <html>
|   <head>
|   <body>
|     <form>
|     <form>
|       "x"

#data
<template><form>a</template><form>b
#document
| <html>
|   <head>
|     <template>
|       content
|         <form>
|           "a"
|   <body>
|     <form>
|       "b"

#data
<select><option>a<select><option>b
#document
| <html>
|   <head>
|   <body>
|     <select>
|       <option>
|         "a"
|     <option>
|       "b"

#data
<head><basefont><bgsound></head><body><wbr><keygen>x
#document
| <html>
|   <head>
|     <basefont>
|     <bgsound>
|   <body>
|     <wbr>
|     <keygen>
|     "x"

#data
<table><form>x</form></table>
#document
| <html>
|   <head>
|   <body>
|     "x"
|     <table>
|       <form>
"""


# Round-5 family #27: the RCDATA/rawtext/script-data end-tag-open
# machinery (WHATWG 13.2.5.9-17): an APPROPRIATE end tag closes even
# with trailing whitespace, attributes, or a self-closing slash
# before the ">"; a non-matching name (</titlex>, </scriptx>) or a
# space straight after "</" flushes the buffered "</" + chars back
# as literal text and stays in the data state; and the match is
# ASCII case-insensitive on both sides (<TITLE>..</tItLe>).  Every
# expectation hand-derived from the spec before pinning.
DAT27 = r"""
#data
<title>x</title >y
#document
| <html>
|   <head>
|     <title>
|       "x"
|   <body>
|     "y"

#data
<title>x</titlex></title>y
#document
| <html>
|   <head>
|     <title>
|       "x</titlex>"
|   <body>
|     "y"

#data
<script>a</script foo=bar>b
#document
| <html>
|   <head>
|     <script>
|       "a"
|   <body>
|     "b"

#data
<script>a</script/>b
#document
| <html>
|   <head>
|     <script>
|       "a"
|   <body>
|     "b"

#data
<script>a</scriptx>b</script>c
#document
| <html>
|   <head>
|     <script>
|       "a</scriptx>b"
|   <body>
|     "c"

#data
<TITLE>x</tItLe>y
#document
| <html>
|   <head>
|     <title>
|       "x"
|   <body>
|     "y"

#data
<style>a</ style></style>b
#document
| <html>
|   <head>
|     <style>
|       "a</ style>"
|   <body>
|     "b"

#data
<textarea>a</textarea	>b
#document
| <html>
|   <head>
|   <body>
|     <textarea>
|       "a"
|     "b"
"""


# Round-5 family #28: PLAINTEXT interaction with fostering and the
# legacy select ignore (a table-context <plaintext> is foster-parented
# BEFORE the table and then swallows the rest of the input including
# </table>; in select the start tag is ignored and the text falls
# into the select); initial-mode tolerance (leading whitespace and
# comments do not forfeit the DOCTYPE — no quirks); duplicate
# attribute dropping happens on the LOWERCASED tokenizer name BEFORE
# the SVG camelCase adjustment (viewbox/viewBox/VIEWBOX collapse to
# the first, then adjust to viewBox); and in-body colgroup being in
# the stray-table-tag ignore list.  Every expectation hand-derived
# from WHATWG 13.2.5.5/13.2.6.4.1/.4.7/13.2.6.2 before pinning.
DAT28 = r"""
#data
<table><plaintext>x</table>y
#document
| <html>
|   <head>
|   <body>
|     <plaintext>
|       "x</table>y"
|     <table>

#data
 	
<!DOCTYPE html><p>x
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       "x"

#data
<!--c--><!DOCTYPE html><p>x
#document
| <!-- c -->
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       "x"

#data
<svg viewbox=1 viewBox=2 VIEWBOX=3></svg>
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       viewBox="1"

#data
<select><plaintext>x
#document
| <html>
|   <head>
|   <body>
|     <select>
|       "x"

#data
<colgroup><plaintext>
#document
| <html>
|   <head>
|   <body>
|     <plaintext>
"""


# Round-5 family #29: <svg> is phrasing content (an open <p>
# survives it); <html> is NOT in the foreign-content breakout list
# (it nests as <svg html> with its attributes) while <body> and
# <head> ARE — the body token then merges its attributes onto the
# EXISTING body element, and the head token is a stray ignored in
# body; and </body> seen from inside a table row is IGNORED because
# <table> is a scope boundary (body is not "in scope"), so the
# following text goes through in-table-text fostering instead of
# after-body.  Every expectation hand-derived from WHATWG 13.2.6.5
# (breakout list), 13.2.6.4.7, and the "has an element in scope"
# algorithm (13.2.4.2) before pinning.
DAT29 = r"""
#data
<p>a<svg>b</svg>c</p>d
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "a"
|       <svg svg>
|         "b"
|       "c"
|     "d"

#data
<svg><html x=y>z
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg html>
|         x="y"
|         "z"

#data
<svg><body x=y>z
#document
| <html>
|   <head>
|   <body>
|     x="y"
|     <svg svg>
|     "z"

#data
<table><tr></body>x
#document
| <html>
|   <head>
|   <body>
|     "x"
|     <table>
|       <tbody>
|         <tr>

#data
<svg><head>x
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|     "x"
"""


# Round-5 family #30: in-select forwards an <html> start tag to the
# in-body rules, which MERGE its new attributes onto the existing
# root element — including from a select fostered out of a table
# ("in select in table").  Pins the full machine's side of the
# round-5 fast-lane fuzz find (test_fastparse.py::
# test_select_html_attr_merge pins the fast lane).  Hand-derived
# from WHATWG 13.2.6.4.16 + .4.7 before pinning.
DAT30 = r"""
#data
<select><html lang=en><option>x
#document
| <html>
|   lang="en"
|   <head>
|   <body>
|     <select>
|       <option>
|         "x"

#data
<table><select><html a=b>x</select>y</table>z
#document
| <html>
|   a="b"
|   <head>
|   <body>
|     <select>
|       "x"
|     "y"
|     <table>
|     "z"

#data
<select><option><html dir=rtl>x</select>y
#document
| <html>
|   dir="rtl"
|   <head>
|   <body>
|     <select>
|       <option>
|         "x"
|     "y"
"""


# Round-5 family #31: a second <nobr> triggering the agency for the
# open one (siblings, no furthest block); the in-body
# any-other-end-tag loop requires "an HTML element with the same tag
# name" — an open HTML <b> inside <svg desc>/<svg foreignObject>
# means </desc>/</foreignObject>/</svg> all hit the foreign SPECIAL
# element first and are IGNORED, text accumulating in the <b>;
# formatting kept open across a table (no reconstruction needed,
# text re-enters the still-open <b>); and the adoption02 <i><p>
# classic (furthest-block p moves to the common ancestor, the clone
# holds the text, trailing text lands in p, the next <i>
# reconstructs).  Every expectation hand-derived from WHATWG
# 13.2.6.4.7 (any other end tag; nobr) / 13.2.6.7 before pinning.
DAT31 = r"""
#data
<nobr>a<nobr>b</nobr>c
#document
| <html>
|   <head>
|   <body>
|     <nobr>
|       "a"
|     <nobr>
|       "b"
|     "c"

#data
<svg><desc>x<b>y</desc>z</svg>w
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg desc>
|         "x"
|         <b>
|           "yzw"

#data
<b>x<table></table>y</b>z
#document
| <html>
|   <head>
|   <body>
|     <b>
|       "x"
|       <table>
|       "y"
|     "z"

#data
<i><p>a</i>b<i>c
#document
| <html>
|   <head>
|   <body>
|     <i>
|     <p>
|       <i>
|         "a"
|       "b"
|       <i>
|         "c"

#data
<svg><foreignObject><b>x</foreignObject>y</svg>z
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg foreignObject>
|         <b>
|           "xyz"
"""

# Modern-element and numeric-reference edge matrix (search-element.dat /
# menuitem-element.dat / domjs-unsafe.dat territory).  The <search>
# element (WHATWG addition 2023) is in BOTH the in-body p-closing block
# start-tag list and the matching end-tag list — authoring this family
# found and fixed a round-5 engine gap where `search` sat in the
# "special" category but not in _BLOCK_START, so `<p>a<search>` nested
# the search inside the p instead of closing it.  <slot> is an ordinary
# element (no special rule); <image> is the spec's rename-to-img parse
# error; the &#x8X; cases pin the C1-control remap table (§13.2.5.80
# numeric-reference-end state) and the surrogate / out-of-range /
# noncharacter matrix.
DAT32 = r"""
#data
<p>a<search>b</search>c
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "a"
|     <search>
|       "b"
|     "c"

#data
<search><p>a</search>b
#document
| <html>
|   <head>
|   <body>
|     <search>
|       <p>
|         "a"
|     "b"

#data
<button><p>a</search>b
#document
| <html>
|   <head>
|   <body>
|     <button>
|       <p>
|         "ab"

#data
<table><search>x
#document
| <html>
|   <head>
|   <body>
|     <search>
|       "x"
|     <table>

#data
<li>a<search>b<li>c
#document
| <html>
|   <head>
|   <body>
|     <li>
|       "a"
|       <search>
|         "b"
|         <li>
|           "c"

#data
</search>x
#document
| <html>
|   <head>
|   <body>
|     "x"

#data
<p>a<dialog>b</dialog>c
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "a"
|     <dialog>
|       "b"
|     "c"

#data
<p>a<slot name=s>b</slot>c
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "a"
|       <slot>
|         name="s"
|         "b"
|       "c"

#data
<p>x<image src=a>y
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "x"
|       <img>
|         src="a"
|       "y"

#data
&#x80;&#x82;&#x8A;&#x99;&#x9F;
#document
| <html>
|   <head>
|   <body>
|     "€‚Š™Ÿ"

#data
&#xD800;x&#xDFFF;
#document
| <html>
|   <head>
|   <body>
|     "�x�"

#data
a&#x10FFFF;b&#x110000;c
#document
| <html>
|   <head>
|   <body>
|     "a􏿿b�c"

#data
<select><hr><option>a
#document
| <html>
|   <head>
|   <body>
|     <select>
|       <hr>
|       <option>
|         "a"

#data
<select><option>a<hr><option>b
#document
| <html>
|   <head>
|   <body>
|     <select>
|       <option>
|         "a"
|       <hr>
|       <option>
|         "b"

#data
<select><optgroup><option>x<hr>y</select>z
#document
| <html>
|   <head>
|   <body>
|     <select>
|       <optgroup>
|         <option>
|           "x"
|       <hr>
|       "y"
|     "z"

#data
<table><td><select><hr>a
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             <select>
|               <hr>
|               "a"
"""


# Marquee as scope boundary and AFE marker (</p> inside marquee
# inserts an EMPTY p because the outer p is hidden from button scope;
# </b> inside marquee is ignored because the marker hides the outer b
# — which is still open and receives the text after </marquee>), an
# HTML end tag reaching through an open foreign subtree to close the
# cell, and the video/source/track void-children family.
DAT42 = r"""
#data
<p>a<marquee>b</p>c</marquee>d
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "a"
|       <marquee>
|         "b"
|         <p>
|         "c"
|       "d"

#data
<b><marquee>x</b>y</marquee>z
#document
| <html>
|   <head>
|   <body>
|     <b>
|       <marquee>
|         "xy"
|       "z"

#data
<table><td><svg><g>x</td>y
#document
| <html>
|   <head>
|   <body>
|     "y"
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             <svg svg>
|               <svg g>
|                 "x"

#data
<video><source src=a><track kind=b>x</video>y
#document
| <html>
|   <head>
|   <body>
|     <video>
|       <source>
|         src="a"
|       <track>
|         kind="b"
|       "x"
|     "y"
"""


# Case-adjustment tables on the foreign ROOT element (viewbox ->
# viewBox, attributename -> attributeName, foreignobject ->
# foreignObject, definitionurl -> definitionURL), metadata content
# riding the in-head rules INSIDE an open table row, and the
# in-select anything-else rule eating <p>/<div> while their text
# accumulates in the open option.
DAT41 = r"""
#data
<svg viewbox="0 0 1 1" attributename=x><foreignobject>y
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       attributeName="x"
|       viewBox="0 0 1 1"
|       <svg foreignObject>
|         "y"

#data
<math definitionurl=u><mi>m
#document
| <html>
|   <head>
|   <body>
|     <math math>
|       definitionURL="u"
|       <math mi>
|         "m"

#data
<table><tr><style>.c{}</style><td>x
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <style>
|             ".c{}"
|           <td>
|             "x"

#data
<select><option>a<p>b<div>c</select>d
#document
| <html>
|   <head>
|   <body>
|     <select>
|       <option>
|         "abc"
|     "d"
"""


# Table recovery ladders and no-furthest-block AAA: a td after </tr>
# implies a fresh row; <col> from inside a CELL closes cell -> row ->
# section and opens a colgroup AFTER the tbody (while the char after
# it fosters out of the table); a stray </th> in a td cell is ignored;
# whitespace-only table text stays INSIDE the table/tr; and the
# em/strong/small misnest runs the adoption agency's simple-pop path
# (no furthest block) with AFE reconstruction at each following char.
DAT40 = r"""
#data
<table><tr><td></tr><td>x
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|         <tr>
|           <td>
|             "x"

#data
<em><strong><small>x</em>y</strong>z
#document
| <html>
|   <head>
|   <body>
|     <em>
|       <strong>
|         <small>
|           "x"
|     <strong>
|       <small>
|         "y"
|     <small>
|       "z"

#data
<table><tr><td>a</th>b
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "ab"

#data
<table><tbody><tr><td>a<col width=9>b
#document
| <html>
|   <head>
|   <body>
|     "b"
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "a"
|       <colgroup>
|         <col>
|           width="9"

#data
<table> <tr> <td>a b
#document
| <html>
|   <head>
|   <body>
|     <table>
|       " "
|       <tbody>
|         <tr>
|           " "
|           <td>
|             "a b"
"""


# The rawtext/RCDATA element matrix: svg <style> is a plain foreign
# element (a <b> inside it BREAKS OUT to body and swallows the stray
# close tags), HTML noembed/iframe are genuine rawtext, textarea is
# RCDATA (entities DO decode), and xmp is rawtext (entities do NOT).
DAT39 = r"""
#data
<svg><style>x<b>y</style>z</svg>w
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg style>
|         "x"
|     <b>
|       "yzw"

#data
<noembed>x<b>y</noembed>z
#document
| <html>
|   <head>
|   <body>
|     <noembed>
|       "x<b>y"
|     "z"

#data
<iframe>a<b>c</iframe>d
#document
| <html>
|   <head>
|   <body>
|     <iframe>
|       "a<b>c"
|     "d"

#data
<textarea>&lt;b&gt;</textarea>
#document
| <html>
|   <head>
|   <body>
|     <textarea>
|       "<b>"

#data
<xmp>&amp;<b></xmp>ok
#document
| <html>
|   <head>
|   <body>
|     <xmp>
|       "&amp;<b>"
|     "ok"
"""


# AFE reconstruction chains across implied-p closes, heading implied
# close (h2 pops an open h1), a div fostered from in-row while the tr
# stays open for the next cell, the form-pointer template bypass (a
# form INSIDE template content is allowed while a sibling form after
# it is still ignored), and td-closes-caption with the implied
# tbody/tr ladder on reprocess.
DAT38 = r"""
#data
<p><b>1<p>2<i>3<p>4
#document
| <html>
|   <head>
|   <body>
|     <p>
|       <b>
|         "1"
|     <p>
|       <b>
|         "2"
|         <i>
|           "3"
|     <p>
|       <b>
|         <i>
|           "4"

#data
<h1>a<h2>b</h2>c
#document
| <html>
|   <head>
|   <body>
|     <h1>
|       "a"
|     <h2>
|       "b"
|     "c"

#data
<table><tr><div>x</div><td>y
#document
| <html>
|   <head>
|   <body>
|     <div>
|       "x"
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "y"

#data
<form>a<template><form>b</form></template>c<form>d
#document
| <html>
|   <head>
|   <body>
|     <form>
|       "a"
|       <template>
|         content
|           <form>
|             "b"
|       "cd"

#data
<table><caption>a<td>x
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <caption>
|         "a"
|       <tbody>
|         <tr>
|           <td>
|             "x"
"""


# Tokenizer error-recovery and fragment-dispatch edges: the solidus
# that is not directly before '>' is dropped, '<' before a digit is
# literal text while '</' before a digit opens a bogus comment, '<'
# is legal INSIDE an attribute name, junk after the doctype name
# force-quirks the document (table stays inside p), the select
# fragment context routes through in-select (pinning hr-in-select on
# the fragment path too), and a breakout tag in an svg-path fragment
# walks up to the root html element and lands as an HTML element
# while the NEXT tag re-enters foreign via the context element.
DAT37 = r"""
#data
<div/ id=a>x
#document
| <html>
|   <head>
|   <body>
|     <div>
|       id="a"
|       "x"

#data
a<42>b</42>c
#document
| <html>
|   <head>
|   <body>
|     "a<42>b"
|     <!-- 42 -->
|     "c"

#data
<a <b>y
#document
| <html>
|   <head>
|   <body>
|     <a>
|       <b=""
|       "y"

#data
<!DOCTYPE html x><p>a<table><td>z
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       "a"
|       <table>
|         <tbody>
|           <tr>
|             <td>
|               "z"

#data
x<option>a<hr><optgroup>b
#document-fragment
select
#document
| "x"
| <option>
|   "a"
| <hr>
| <optgroup>
|   "b"

#data
<b>x</b><rect>
#document-fragment
svg path
#document
| <b>
|   "x"
| <svg rect>
"""


# Foreign-dispatch corner cases (an <svg> start tag inside a plain
# MathML annotation-xml opens a REAL SVG subtree — the dispatcher
# exception that needs no encoding attribute; an <svg> inside an SVG
# integration point (desc) likewise re-enters via the HTML rules;
# svg-namespaced <mtext> carries no MathML semantics), the
# case-insensitive type=hidden table exemption next to a fostered
# non-hidden input, the pre/listing leading-newline rule, the named-ref
# legacy attribute exception (&ampc stays literal, &amp; expands),
# after-after-body comments landing on the Document, stray
# tbody/tr/td ignored in body, and button/option implicit closes.
DAT36 = r"""
#data
<math><annotation-xml><svg><circle r=1>x
#document
| <html>
|   <head>
|   <body>
|     <math math>
|       <math annotation-xml>
|         <svg svg>
|           <svg circle>
|             r="1"
|             "x"

#data
<svg><mtext>a</mtext></svg>
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg mtext>
|         "a"

#data
<table><input type=HIDDEN><input type=text>y
#document
| <html>
|   <head>
|   <body>
|     <input>
|       type="text"
|     "y"
|     <table>
|       <input>
|         type="HIDDEN"

#data
<a href=a&amp;b&ampc>z
#document
| <html>
|   <head>
|   <body>
|     <a>
|       href="a&b&ampc"
|       "z"

#data
<svg><desc><svg><rect/>a
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg desc>
|         <svg svg>
|           <svg rect>
|           "a"

#data
<body></body></html><!--c-->x
#document
| <html>
|   <head>
|   <body>
|     "x"
| <!-- c -->

#data
x<tbody><tr><td>y
#document
| <html>
|   <head>
|   <body>
|     "xy"

#data
<button>a<button>b
#document
| <html>
|   <head>
|   <body>
|     <button>
|       "a"
|     <button>
|       "b"

#data
<option>a<option>b<optgroup>c
#document
| <html>
|   <head>
|   <body>
|     <option>
|       "a"
|     <option>
|       "b"
|     <optgroup>
|       "c"
"""


# frameset-ok nuances (an EXPLICIT <body> tag sets frameset-ok to
# "not ok" so a later <frameset> is ignored and the second <body>
# merges attributes; a mere <p> does NOT, so <frameset> replaces the
# implied body), the mglyph/malignmark integration-point exception
# (they stay MathML where any other start tag breaks out to HTML),
# </br>-acts-as-<br> and </p>-inserts-empty-p error recovery, the
# cell AFE marker keeping a nested <a> from triggering AAA across a
# table, and the in-head-noscript scripting matrix.
DAT35 = r"""
#data
<math><mi><mglyph>x<b>y
#document
| <html>
|   <head>
|   <body>
|     <math math>
|       <math mi>
|         <math mglyph>
|           "x"
|         <b>
|           "y"

#data
a</br>b</p>c
#document
| <html>
|   <head>
|   <body>
|     "a"
|     <br>
|     "b"
|     <p>
|     "c"

#data
<a href=1><table><td><a href=2>x</table>y
#document
| <html>
|   <head>
|   <body>
|     <a>
|       href="1"
|       <table>
|         <tbody>
|           <tr>
|             <td>
|               <a>
|                 href="2"
|                 "x"
|       "y"

#data
<body a=1><frameset>x</frameset><body b=2 a=3>z
#document
| <html>
|   <head>
|   <body>
|     a="1"
|     b="2"
|     "xz"

#data
<p><frameset><frame src=a>
#document
| <html>
|   <head>
|   <frameset>
|     <frame>
|       src="a"

#data
<head><noscript><style>x</style><div>y
#script-off
#document
| <html>
|   <head>
|     <noscript>
|       <style>
|         "x"
|   <body>
|     <div>
|       "y"

#data
<head><noscript><style>x</style><div>y
#script-on
#document
| <html>
|   <head>
|     <noscript>
|       "<style>x</style><div>y"
|   <body>
"""


# MathML-integration-point tables, in-template table modes (a tr in
# template content gets NO implied tbody — the in-template dispatch
# pushes "in table body" directly), fostered-formatting AFE carry
# across a whole table, the quirks-vs-standards p/table contrast
# (quirks mode does NOT close p before table), and li/dt/dd runs.
DAT34 = r"""
#data
<math><mtext><table><tr><td>x
#document
| <html>
|   <head>
|   <body>
|     <math math>
|       <math mtext>
|         <table>
|           <tbody>
|             <tr>
|               <td>
|                 "x"

#data
<math><mo>a<table>b
#document
| <html>
|   <head>
|   <body>
|     <math math>
|       <math mo>
|         "ab"
|         <table>

#data
<table><template><tr><td>a</template><tr><td>b
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <template>
|         content
|           <tr>
|             <td>
|               "a"
|       <tbody>
|         <tr>
|           <td>
|             "b"

#data
<table><b><tr><td>x</td></tr></table>y
#document
| <html>
|   <head>
|   <body>
|     <b>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "x"
|     <b>
|       "y"

#data
<table><tr><td><button>a<td>b
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             <button>
|               "a"
|           <td>
|             "b"

#data
<object><param name=a><p>x
#document
| <html>
|   <head>
|   <body>
|     <object>
|       <param>
|         name="a"
|       <p>
|         "x"

#data
<p>x<table><tr><td>y
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "x"
|       <table>
|         <tbody>
|           <tr>
|             <td>
|               "y"

#data
<!DOCTYPE html><p>x<table><tr><td>y
#document
| <!DOCTYPE html>
| <html>
|   <head>
|   <body>
|     <p>
|       "x"
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "y"

#data
<ul><li>a<ul><li>b</ul>c
#document
| <html>
|   <head>
|   <body>
|     <ul>
|       <li>
|         "a"
|         <ul>
|           <li>
|             "b"
|         "c"

#data
<dl><dt>a<dd>b<dt>c
#document
| <html>
|   <head>
|   <body>
|     <dl>
|       <dt>
|         "a"
|       <dd>
|         "b"
|       <dt>
|         "c"
"""


# inbody01 / after-body / head-noise territory: the body↔html boundary
# (text and comments after </body> and </html>, head re-entry for
# metadata after </head>), the form-pointer and hidden-input table
# exemptions, xmp's reconstruct-then-rawtext, caption's anything-else
# fallthrough for a nested <table>, implied colgroup with attributes,
# and the after-frameset comment/noframes tail.
DAT33 = r"""
#data
<body>a</body>b
#document
| <html>
|   <head>
|   <body>
|     "ab"

#data
<body></body><!--x--><p>y
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "y"
|   <!-- x -->

#data
</html>x
#document
| <html>
|   <head>
|   <body>
|     "x"

#data
<head></head>x<link rel=a>
#document
| <html>
|   <head>
|   <body>
|     "x"
|     <link>
|       rel="a"

#data
<head></head><base href=u><body>z
#document
| <html>
|   <head>
|     <base>
|       href="u"
|   <body>
|     "z"

#data
<title>a<b>c</title>d
#document
| <html>
|   <head>
|     <title>
|       "a<b>c"
|   <body>
|     "d"

#data
<table><form><input type=hidden><td>x
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <form>
|       <input>
|         type="hidden"
|       <tbody>
|         <tr>
|           <td>
|             "x"

#data
<b>a<xmp>b</xmp>c
#document
| <html>
|   <head>
|   <body>
|     <b>
|       "a"
|       <xmp>
|         "b"
|       "c"

#data
<svg><title>a<b>c</title></svg>d
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg title>
|         "a"
|         <b>
|           "cd"

#data
<table><col width=1><tr><td>x
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <colgroup>
|         <col>
|           width="1"
|       <tbody>
|         <tr>
|           <td>
|             "x"

#data
<table><caption>a<table>b
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <caption>
|         "ab"
|         <table>

#data
<frameset></frameset><!--c--><noframes>x
#document
| <html>
|   <head>
|   <frameset>
|   <!-- c -->
|   <noframes>
|     "x"
"""


# Family #43 — inbody01 / namespace-sensitivity territory: the
# any-other-end-tag walk ABORTING at a special element before reaching
# its match (</foo> with an open <p> is ignored outright, so the text
# keeps flowing into the p); unknown elements as formatting-transparent
# containers; dd/dt mutual-close runs with li breaking at the special
# dd rather than closing it; table-section tag names (tbody/tr/td/
# thead/tfoot) inside <svg> staying FOREIGN (none are in the §13.2.6.5
# breakout list — namespace-sensitivity's core trap); hgroup closing
# an open p, h1→h2 implied heading close INSIDE hgroup, and the block
# end-tag popping the still-open heading (h2 is not in the
# implied-end-tag list); nested <ul> text placement after the inner
# list closes; hyphenated foreign element + attribute dumped verbatim;
# unknown MathML children staying in the math namespace.  Every
# expectation hand-derived from WHATWG 13.2.6.4.7/13.2.6.5 before
# pinning; both lanes (TreeBuilder + fastparse) adjudicated.
DAT43 = r"""
#data
<button>1</foo>2
#document
| <html>
|   <head>
|   <body>
|     <button>
|       "12"

#data
<foo>1<p>2</foo>3</p>
#document
| <html>
|   <head>
|   <body>
|     <foo>
|       "1"
|       <p>
|         "23"

#data
<dd>a<dd>b<dt>c<dt>d<dd>e<li>f<li>g
#document
| <html>
|   <head>
|   <body>
|     <dd>
|       "a"
|     <dd>
|       "b"
|     <dt>
|       "c"
|     <dt>
|       "d"
|     <dd>
|       "e"
|       <li>
|         "f"
|       <li>
|         "g"

#data
<svg><tbody><tr><td>x
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg tbody>
|         <svg tr>
|           <svg td>
|             "x"

#data
<svg><thead>a</thead><tfoot>b
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg thead>
|         "a"
|       <svg tfoot>
|         "b"

#data
<hgroup><h1>a<h2>b</hgroup>c
#document
| <html>
|   <head>
|   <body>
|     <hgroup>
|       <h1>
|         "a"
|       <h2>
|         "b"
|     "c"

#data
<p>a<hgroup>b
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "a"
|     <hgroup>
|       "b"

#data
<ul><li>a<ul><li>b</ul>c</li>d
#document
| <html>
|   <head>
|   <body>
|     <ul>
|       <li>
|         "a"
|         <ul>
|           <li>
|             "b"
|         "c"
|       "d"

#data
<svg><foo-bar baz-qux="1">x
#document
| <html>
|   <head>
|   <body>
|     <svg svg>
|       <svg foo-bar>
|         baz-qux="1"
|         "x"

#data
<math><mrow><mi>a</mi><foo>b</foo></mrow>z
#document
| <html>
|   <head>
|   <body>
|     <math math>
|       <math mrow>
|         <math mi>
|           "a"
|         <math foo>
|           "b"
|       "z"
"""


# Family #44 — the interactive-element p-closers the corpus never
# sampled: summary/details/dialog are ALL in the §13.2.6.4.7 p-closing
# start-tag list (same entry as address/div) AND the matching end-tag
# list (generate implied end tags, then pop to the match), yet
# summary/details had zero goldens and dialog two.  Cases pin: each of
# the three closing an open <p>; their end tags implying the open <p>
# closed (p IS in the implied-end-tag list, details/summary are NOT);
# </dialog> with none in scope ignored outright; </summary> reaching
# through an open <p> via the standard-scope check (p and details do
# not block scope); <details> inserted under a still-open formatting
# <b> without reconstruction churn; and </button> popping a details
# that implied-end-tags alone would never close.  Every expectation
# hand-derived from WHATWG 13.2.6.4.7 before pinning; both lanes
# (TreeBuilder + fastparse) adjudicated.
DAT44 = r"""
#data
<p>x<details>y</details><p>z<summary>w
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "x"
|     <details>
|       "y"
|     <p>
|       "z"
|     <summary>
|       "w"

#data
<details><p>x</details>y
#document
| <html>
|   <head>
|   <body>
|     <details>
|       <p>
|         "x"
|     "y"

#data
a</dialog>b
#document
| <html>
|   <head>
|   <body>
|     "ab"

#data
<p>a<dialog>b</dialog>c
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "a"
|     <dialog>
|       "b"
|     "c"

#data
<details><summary><p>s</summary>t</details>u
#document
| <html>
|   <head>
|   <body>
|     <details>
|       <summary>
|         <p>
|           "s"
|       "t"
|     "u"

#data
<b><p>x<details>y
#document
| <html>
|   <head>
|   <body>
|     <b>
|       <p>
|         "x"
|       <details>
|         "y"

#data
<dialog><p>one<p>two</dialog><p>three
#document
| <html>
|   <head>
|   <body>
|     <dialog>
|       <p>
|         "one"
|       <p>
|         "two"
|     <p>
|       "three"

#data
<button><details>x</button>y
#document
| <html>
|   <head>
|   <body>
|     <button>
|       <details>
|         "x"
|     "y"
"""


# Family #45 — the form-associated ORDINARY elements (label, legend,
# output, progress, meter, datalist) that had zero golden coverage.
# They are not in the §13.2.4.2 special category, which flips three
# behaviors relative to their special-looking siblings: (a) they never
# act as an AAA furthest block, so misnested formatting takes the
# no-furthest-block simple-pop path instead of the full agency (the
# <fieldset> contrast case runs the full agency and also pins the
# post-AAA insertion point: following text lands in the FURTHEST BLOCK
# as a sibling of the clone, exactly like adoption01's <a><p></a>a);
# (b) the any-other-end-tag walk steps straight THROUGH them to find a
# match (but still aborts at a genuinely special element like <p>);
# (c) they do not close an open <p> — while <fieldset> (special AND in
# the p-closing start-tag list) does all three opposites.  Expectations
# hand-derived from WHATWG 13.2.6.4.7 (in body) + the AAA steps in
# 13.2.6.5 before pinning; both lanes adjudicated by
# test_fastparse.test_golden_cases_fast_lane_parity.
DAT45 = r"""
#data
<p>a<fieldset>b<legend>c</fieldset>d
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "a"
|     <fieldset>
|       "b"
|       <legend>
|         "c"
|     "d"

#data
<p>a<label>b<p>c
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "a"
|       <label>
|         "b"
|     <p>
|       "c"

#data
<b><label>x</b>y
#document
| <html>
|   <head>
|   <body>
|     <b>
|       <label>
|         "x"
|     "y"

#data
<b><fieldset>x</b>y
#document
| <html>
|   <head>
|   <body>
|     <b>
|     <fieldset>
|       <b>
|         "x"
|       "y"

#data
<progress>1<meter>2</progress>3
#document
| <html>
|   <head>
|   <body>
|     <progress>
|       "1"
|       <meter>
|         "2"
|     "3"

#data
<datalist><option>a<option>b</datalist>c
#document
| <html>
|   <head>
|   <body>
|     <datalist>
|       <option>
|         "a"
|       <option>
|         "b"
|     "c"

#data
<p><legend>a</p>b
#document
| <html>
|   <head>
|   <body>
|     <p>
|       <legend>
|         "a"
|     "b"

#data
<output><p>x</output>y
#document
| <html>
|   <head>
|   <body>
|     <output>
|       <p>
|         "xy"

#data
<table><label>x<td>y</table>z
#document
| <html>
|   <head>
|   <body>
|     <label>
|       "x"
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "y"
|     "z"

#data
<p><datalist><option>x</datalist></p>y
#document
| <html>
|   <head>
|   <body>
|     <p>
|       <datalist>
|         <option>
|           "x"
|     "y"
"""


# Family #46 — zero-coverage leftovers with real parser rules:
# <dir> (legacy, SPECIAL, p-closing, and a <li>-algorithm scope
# breaker — an open <li> survives a nested <dir><li>), the void
# elements <embed> (area/br/embed/img/keygen/wbr rule) and <source>
# (param/source/track rule, here inside its natural <picture> host),
# <figcaption>/<article>/<nav> from the §13.2.6.4.7 p-closing list —
# with the stray-</p> case pinning the insert-dummy-p-then-close rule
# — and ordinary <time>/<bdo> stepped through by any-other-end-tag.
# Expectations hand-derived from WHATWG 13.2.6.4.7 before pinning;
# both lanes adjudicated by the fast-lane parity test.
DAT46 = r"""
#data
<ul><li>a<dir><li>b</dir>c
#document
| <html>
|   <head>
|   <body>
|     <ul>
|       <li>
|         "a"
|         <dir>
|           <li>
|             "b"
|         "c"

#data
<p>x<dir>y
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "x"
|     <dir>
|       "y"

#data
<p>a<embed src="e">b
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "a"
|       <embed>
|         src="e"
|       "b"

#data
<picture><source srcset="s"><img src="i">t</picture>u
#document
| <html>
|   <head>
|   <body>
|     <picture>
|       <source>
|         srcset="s"
|       <img>
|         src="i"
|       "t"
|     "u"

#data
<p>a<figcaption>b</p>c
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "a"
|     <figcaption>
|       "b"
|       <p>
|       "c"

#data
<p>1<article>2<nav>3</article>4
#document
| <html>
|   <head>
|   <body>
|     <p>
|       "1"
|     <article>
|       "2"
|       <nav>
|         "3"
|     "4"

#data
<time>a<bdo dir="rtl">b</time>c
#document
| <html>
|   <head>
|   <body>
|     <time>
|       "a"
|       <bdo>
|         dir="rtl"
|         "b"
|     "c"
"""


# Family #47 — tokenizer error-recovery forms with no golden yet,
# each pinning a distinct §13.2.5 transition: `</>` (empty end tag,
# dropped entirely, both surrounding texts merge), `<!->` (markup
# declaration open fails the `--` match one char short -> bogus
# comment holding the lone "-"), `< a>` / `<3` (tag-open on
# non-alpha re-emits the "<" as text), `</ b>` (end-tag-open on
# non-alpha -> bogus comment, NOT text), `<a =b>` (unexpected equals
# before attribute name starts an attribute literally named "=b"),
# and `<p/q r=s>` (slash mid-tag is dropped, the element is NOT
# self-closed, q becomes a valueless attribute).  Hand-derived from
# the WHATWG tokenizer states before pinning; both lanes adjudicated.
DAT47 = r"""
#data
x</>y
#document
| <html>
|   <head>
|   <body>
|     "xy"

#data
x<!->y
#document
| <html>
|   <head>
|   <body>
|     "x"
|     <!-- - -->
|     "y"

#data
a< b>c
#document
| <html>
|   <head>
|   <body>
|     "a< b>c"

#data
a<3b
#document
| <html>
|   <head>
|   <body>
|     "a<3b"

#data
a</ b>c
#document
| <html>
|   <head>
|   <body>
|     "a"
|     <!--  b -->
|     "c"

#data
<span =b>x
#document
| <html>
|   <head>
|   <body>
|     <span>
|       =b=""
|       "x"

#data
<p/q r=s>t
#document
| <html>
|   <head>
|   <body>
|     <p>
|       q=""
|       r="s"
|       "t"
"""


# Family #48 — fragment contexts the set never sampled, each hitting
# a distinct branch of the reset-the-insertion-mode algorithm
# (§13.2.4.1) or the fragment tokenizer-state table (§13.2.2):
# optgroup has no case of its own in reset-the-insertion-mode, so it
# falls through to the anything-else branch ("in body"), whose option
# start-tag pop rule happens to yield the same tree as "in select"
# (option start tags pop an open option); style and iframe put the tokenizer
# in RAWTEXT for the whole input, so markup stays literal text and
# entities do NOT decode; thead resets to "in table body" and grows
# the tr/td ladder without any table element on the stack.
DAT48 = r"""
#data
<option>a<option>b
#document-fragment
optgroup
#document
| <option>
|   "a"
| <option>
|   "b"

#data
a<b>&amp;c
#document-fragment
style
#document
| "a<b>&amp;c"

#data
x<span>y
#document-fragment
iframe
#document
| "x<span>y"

#data
<tr><td>x
#document-fragment
thead
#document
| <tr>
|   <td>
|     "x"
"""


# Family #49 — <xmp>'s start-tag rule is unique among the rawtext
# elements: close an open <p>, then RECONSTRUCT the active formatting
# elements, then switch the tokenizer (§13.2.6.4.7 "xmp").  Case 1
# pins the reconstruction: </p> popped <b> off the stack but left it
# in the AFE, so <xmp> first revives a fresh <b> in body and nests
# under it — and the post-</xmp> text lands back in that revived <b>.
# Case 2 pins xmp's own p-closing with the formatting element still
# open (no reconstruction churn).  Cases 3-4 pin the first-newline
# skip boundary: only the FIRST newline immediately after the
# pre/listing start tag is dropped (a second survives), and an
# intervening element cancels the skip entirely.
DAT49 = r"""
#data
<p><b></p><xmp>y</xmp>z
#document
| <html>
|   <head>
|   <body>
|     <p>
|       <b>
|     <b>
|       <xmp>
|         "y"
|       "z"

#data
<b><p>1<xmp>2
#document
| <html>
|   <head>
|   <body>
|     <b>
|       <p>
|         "1"
|       <xmp>
|         "2"

#data
<listing>

x</listing>
#document
| <html>
|   <head>
|   <body>
|     <listing>
|       "
x"

#data
<pre><span>
x</span></pre>
#document
| <html>
|   <head>
|   <body>
|     <pre>
|       <span>
|         "
x"
"""


# Family #50 — three table-mode details with no golden: (1) </tr>
# arriving in "in cell" runs close-the-cell FIRST and is then
# reprocessed in "in row" (§13.2.6.4.15), so one end tag closes both
# the td and the tr; (2) the in-table <input type=hidden> exemption
# is ASCII case-insensitive on the VALUE — type=HIDDEN stays a child
# of the table (not fostered) while the following text still fosters
# out; (3) a nested <table> start tag inside an open <caption> falls
# through in-caption's anything-else to the in-body rules and nests
# INSIDE the caption (no forced caption close — contrast the
# td-closes-caption family).  Hand-derived from WHATWG 13.2.6.4.9-.15
# before pinning; both lanes adjudicated.
DAT50 = r"""
#data
<table><tr><td>a</tr><tr><td>b</table>c
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <tbody>
|         <tr>
|           <td>
|             "a"
|         <tr>
|           <td>
|             "b"
|     "c"

#data
<table><input type="HIDDEN">x</table>
#document
| <html>
|   <head>
|   <body>
|     "x"
|     <table>
|       <input>
|         type="HIDDEN"

#data
<table><caption>a<table><td>b
#document
| <html>
|   <head>
|   <body>
|     <table>
|       <caption>
|         "a"
|         <table>
|           <tbody>
|             <tr>
|               <td>
|                 "b"
"""


CASES = (parse_dat(DAT) + parse_dat(DAT2) + parse_dat(DAT3)
         + parse_dat(DAT4) + parse_dat(DAT5) + parse_dat(DAT6)
         + parse_dat(DAT7) + parse_dat(DAT8) + parse_dat(DAT9)
         + parse_dat(DAT10) + parse_dat(DAT11) + parse_dat(DAT12)
         + parse_dat(DAT13) + parse_dat(DAT14)
         + parse_dat(DAT15) + parse_dat(DAT16)
         + parse_dat(DAT17) + parse_dat(DAT18)
         + parse_dat(DAT19) + parse_dat(DAT20)
         + parse_dat(DAT21) + parse_dat(DAT22)
         + parse_dat(DAT23) + parse_dat(DAT24)
         + parse_dat(DAT25) + parse_dat(DAT26)
         + parse_dat(DAT27) + parse_dat(DAT28)
         + parse_dat(DAT29) + parse_dat(DAT30)
         + parse_dat(DAT31) + parse_dat(DAT32) + parse_dat(DAT33)
         + parse_dat(DAT34) + parse_dat(DAT35) + parse_dat(DAT36)
         + parse_dat(DAT37) + parse_dat(DAT38) + parse_dat(DAT39)
         + parse_dat(DAT40) + parse_dat(DAT41) + parse_dat(DAT42)
         + parse_dat(DAT43) + parse_dat(DAT44) + parse_dat(DAT45)
         + parse_dat(DAT46) + parse_dat(DAT47) + parse_dat(DAT48)
         + parse_dat(DAT49) + parse_dat(DAT50))


@pytest.mark.parametrize("src,frag_ctx,script,expected", CASES,
                         ids=[c[0][:40] for c in CASES])
def test_tree_golden(src, frag_ctx, script, expected):
    scripts = True if script is None else script
    if frag_ctx is None:
        doc = TreeBuilder(scripts=scripts).parse(src)
        got = tree_format(doc)
    else:
        parts = frag_ctx.split()
        if len(parts) == 2:
            ns, tag = _FRAG_NS[parts[0]], parts[1]
        else:
            from perl_html5_dom_spark.dom.constants import NS_HTML
            ns, tag = NS_HTML, parts[0]
        doc, frag = parse_fragment(src, tag, ns, scripts=scripts)
        got = tree_format(doc, frag)
    assert got == expected, (
        "\n--- got ---\n" + got + "\n--- want ---\n" + expected)
