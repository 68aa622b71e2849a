"""Expression-evaluation test corpus transcribed from the
reference SPARQL suite (sparql/src/test.rs:1102-1993, the
#[test_case] matrix feeding fn test_expr) — 803 (expr,
expected-expr) pairs; "" means evaluation error.  Pairs are
DATA (the behavioral spec), not code; the harness in
test_expr_matrix.py is original.
"""

CASES = [
[
"true    || true",
"true"
],
[
"true    || false",
"true"
],
[
"false   || true",
"true"
],
[
"false   || false",
"false"
],
[
"true    || <tag:x>",
"true"
],
[
"<tag:x> || true",
"true"
],
[
"false   || <tag:x>",
""
],
[
"<tag:x> || false",
""
],
[
"<tag:x> || <tag:x>",
""
],
[
"true    && true",
"true"
],
[
"true    && false",
"false"
],
[
"false   && true",
"false"
],
[
"false   && false",
"false"
],
[
"false   && <tag:x>",
"false"
],
[
"<tag:x> && false",
"false"
],
[
"true    && <tag:x>",
""
],
[
"<tag:x> && true",
""
],
[
"<tag:x> && <tag:x>",
""
],
[
"!true",
"false"
],
[
"!false",
"true"
],
[
"!<tag:x>",
""
],
[
"!(!\"foo\")",
"true"
],
[
"!(!\"\")",
"false"
],
[
"!(!42)",
"true"
],
[
"!(!0)",
"false"
],
[
"!(!\"1\"^^xsd:boolean)",
"true"
],
[
"!(!\"foo\"@en)",
""
],
[
"!(!\"foo\"@en--ltr)",
""
],
[
"!(!\"\"@en)",
""
],
[
"!(!\"\"@en--ltr)",
""
],
[
"!(!\"x\"^^xsd:boolean)",
""
],
[
"!(!<tag:x>)",
""
],
[
"40+2",
"42"
],
[
"40+2.0",
"42.0"
],
[
"40+\"2\"^^xsd:float",
"\"4.2e1\"^^xsd:float"
],
[
"40+2e0",
"4.2e1"
],
[
"100000000000000000000+2",
"100000000000000000002"
],
[
"40+\"2\"",
""
],
[
"40-2",
"38"
],
[
"40-2.0",
"38.0"
],
[
"40-\"2\"^^xsd:float",
"\"3.8e1\"^^xsd:float"
],
[
"40-2e0",
"3.8e1"
],
[
"100000000000000000000-2",
"99999999999999999998"
],
[
"40-\"2\"",
""
],
[
"40*2",
"80"
],
[
"40*2.0",
"80.0"
],
[
"40*\"2\"^^xsd:float",
"\"8e1\"^^xsd:float"
],
[
"40*2e0",
"8e1"
],
[
"100000000000000000000*2",
"200000000000000000000"
],
[
"40*\"2\"",
""
],
[
"40/2",
"20.0"
],
[
"40/2.0",
"20.0"
],
[
"40/\"2\"^^xsd:float",
"\"2e1\"^^xsd:float"
],
[
"40/2e0",
"2e1"
],
[
"100000000000000000000/2",
"50000000000000000000.0"
],
[
"40/\"2\"",
""
],
[
"40/0",
""
],
[
"+(42)",
"42"
],
[
"+(42.0)",
"42.0"
],
[
"+(\"42\"^^xsd:float)",
"\"4.2e1\"^^xsd:float"
],
[
"+(42e0)",
"4.2e1"
],
[
"+(100000000000000000000)",
"100000000000000000000"
],
[
"+(\"42\")",
""
],
[
"+(42/0)",
""
],
[
"-(42)",
"-42"
],
[
"-(42.0)",
"-42.0"
],
[
"-(\"42\"^^xsd:float)",
"-\"4.2e1\"^^xsd:float"
],
[
"-(42e0)",
"-4.2e1"
],
[
"-(100000000000000000000)",
"-100000000000000000000"
],
[
"-(\"42\")",
""
],
[
"-(42/0)",
""
],
[
"if(true, \"foo\", \"bar\")",
"\"foo\""
],
[
"if(false, \"foo\", \"bar\")",
"\"bar\""
],
[
"if(\"baz\", \"foo\", \"bar\")",
"\"foo\""
],
[
"if(\"\", \"foo\", \"bar\")",
"\"bar\""
],
[
"42 in (12, 22, 32, 42, 52)",
"true"
],
[
"42 in (62, 72, 82, 92, 12)",
"false"
],
[
"42 in ()",
"false"
],
[
"42 in (42.0)",
"true"
],
[
"42 in (1/0, 42)",
""
],
[
"<tag:3> in (<tag:1>, <tag:2>, <tag:3>, <tag:4>)",
"true"
],
[
"<tag:3> in (<tag:5>, <tag:6>, <tag:7>, <tag:8>)",
"false"
],
[
"<tag:3> in (\"tag:3\")",
"false"
],
[
"coalesce(1, 2, 3)",
"1"
],
[
"coalesce(1/0, 2, -\"3\")",
"2"
],
[
"coalesce(1/0, -\"2\", 3)",
"3"
],
[
"coalesce(1/0, -\"2\", !(<tag:3>))",
""
],
[
"str(<tag:x>)",
"\"tag:x\""
],
[
"str(\"42\")",
"\"42\""
],
[
"str(\"chat\"@en)",
"\"chat\""
],
[
"str(\"chat\"@en--ltr)",
"\"chat\""
],
[
"str(042)",
"\"042\""
],
[
"str(042+1)",
"\"43\""
],
[
"str(\"a\"^^xsd:integer)",
"\"a\""
],
[
"str(bnode())",
""
],
[
"str(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"str(42/0)",
""
],
[
"lang(\"42\")",
"\"\""
],
[
"lang(\"chat\"@en)",
"\"en\""
],
[
"lang(\"chat\"@en--ltr)",
"\"en\""
],
[
"lang(042)",
"\"\""
],
[
"lang(\"a\"^^xsd:integer)",
"\"\""
],
[
"lang(<tag:x>)",
""
],
[
"lang(bnode())",
""
],
[
"lang(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"lang(42/0)",
""
],
[
"langDir(\"42\")",
"\"\""
],
[
"langDir(\"chat\"@en)",
"\"\""
],
[
"langDir(\"chat\"@en--ltr)",
"\"ltr\""
],
[
"langDir(042)",
"\"\""
],
[
"langDir(\"a\"^^xsd:integer)",
"\"\""
],
[
"langDir(<tag:x>)",
""
],
[
"langDir(bnode())",
""
],
[
"langDir(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"langDir(42/0)",
""
],
[
"hasLang(<tag:x>)",
"false"
],
[
"hasLang(\"a b\")",
"false"
],
[
"hasLang(\"chat\"@en)",
"true"
],
[
"hasLang(\"chat\"@en--ltr)",
"true"
],
[
"hasLang(042)",
"false"
],
[
"hasLang(<<( <tag:s> <tag:p> <tag:o> )>>)",
"false"
],
[
"hasLang(42/0)",
""
],
[
"hasLangDir(<tag:x>)",
"false"
],
[
"hasLangDir(\"a b\")",
"false"
],
[
"hasLangDir(\"chat\"@en)",
"false"
],
[
"hasLangDir(\"chat\"@en--ltr)",
"true"
],
[
"hasLangDir(042)",
"false"
],
[
"hasLangDir(<<( <tag:s> <tag:p> <tag:o> )>>)",
"false"
],
[
"hasLangDir(42/0)",
""
],
[
"datatype(\"42\")",
"xsd:string"
],
[
"datatype(\"chat\"@en)",
"rdf:langString"
],
[
"datatype(\"chat\"@en--ltr)",
"rdf:dirLangString"
],
[
"datatype(042)",
"xsd:integer"
],
[
"datatype(\"a\"^^xsd:integer)",
"xsd:integer"
],
[
"datatype(<tag:x>)",
""
],
[
"datatype(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"datatype(42/0)",
""
],
[
"iri(<tag:x>)",
"<tag:x>"
],
[
"iri(\"tag:y\")",
"<tag:y>"
],
[
"iri(bnode())",
""
],
[
"iri(\"a b\")",
""
],
[
"iri(\"tag:z\"@en)",
""
],
[
"iri(\"tag:z\"@en--ltr)",
""
],
[
"iri(042)",
""
],
[
"iri(\"tag:t\"^^xsd:integer)",
""
],
[
"iri(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"iri(42/0)",
""
],
[
"uri(<tag:x>)",
"<tag:x>"
],
[
"uri(\"tag:y\")",
"<tag:y>"
],
[
"uri(bnode())",
""
],
[
"uri(\"a b\")",
""
],
[
"uri(\"tag:z\"@en)",
""
],
[
"uri(\"tag:z\"@en--ltr)",
""
],
[
"uri(042)",
""
],
[
"uri(\"tag:t\"^^xsd:integer)",
""
],
[
"uri(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"uri(42/0)",
""
],
[
"isBlank(bnode())",
"true"
],
[
"bnode() = bnode()",
"false"
],
[
"isBlank(bnode(\"42\"))",
"true"
],
[
"isBlank(bnode(<tag:x>))",
""
],
[
"isBlank(bnode(\"chat\"@en))",
""
],
[
"isBlank(bnode(\"chat\"@en--ltr))",
""
],
[
"isBlank(bnode(042))",
""
],
[
"isBlank(bnode(<<( <tag:s> <tag:p> <tag:o> )>>))",
""
],
[
"isBlank(bnode(42/0))",
""
],
[
"datatype(rand())",
"xsd:double"
],
[
"0 <= rand()",
"true"
],
[
"rand() < 1",
"true"
],
[
"rand() = rand()",
"false"
],
[
"abs(042)",
"42"
],
[
"abs(3.14)",
"3.14"
],
[
"abs(3.14e0)",
"3.14e0"
],
[
"abs(\"1\"^^xsd:float)",
"\"1e0\"^^xsd:float"
],
[
"abs(-042)",
"42"
],
[
"abs(-3.14)",
"3.14"
],
[
"abs(-3.14e0)",
"3.14e0"
],
[
"abs(\"-1\"^^xsd:float)",
"\"1e0\"^^xsd:float"
],
[
"abs(1e0/0)",
"\"INF\"^^xsd:double"
],
[
"abs(-1e0/0)",
"\"INF\"^^xsd:double"
],
[
"abs(0e0/0)",
"\"NaN\"^^xsd:double"
],
[
"abs(<tag:x>)",
""
],
[
"abs(bnode())",
""
],
[
"abs(\"42\")",
""
],
[
"abs(\"chat\"@en)",
""
],
[
"abs(\"chat\"@en--ltr)",
""
],
[
"abs(\"a\"^^xsd:integer)",
""
],
[
"abs(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"ceil(042)",
"42"
],
[
"ceil(1.0)",
"1.0"
],
[
"ceil(1.4)",
"2.0"
],
[
"ceil(1.5)",
"2.0"
],
[
"ceil(1.6)",
"2.0"
],
[
"ceil(-1.0)",
"-1.0"
],
[
"ceil(-1.4)",
"-1.0"
],
[
"ceil(-1.5)",
"-1.0"
],
[
"ceil(-1.6)",
"-1.0"
],
[
"ceil(1.0e0)",
"1e0"
],
[
"ceil(1.4e0)",
"2e0"
],
[
"ceil(1.5e0)",
"2e0"
],
[
"ceil(1.6e0)",
"2e0"
],
[
"ceil(-1.0e0)",
"-1e0"
],
[
"ceil(-1.4e0)",
"-1e0"
],
[
"ceil(-1.5e0)",
"-1e0"
],
[
"ceil(-1.6e0)",
"-1e0"
],
[
"ceil(\"1.0\"^^xsd:float)",
"\"1e0\"^^xsd:float"
],
[
"ceil(\"1.4\"^^xsd:float)",
"\"2e0\"^^xsd:float"
],
[
"ceil(\"1.5\"^^xsd:float)",
"\"2e0\"^^xsd:float"
],
[
"ceil(\"1.6\"^^xsd:float)",
"\"2e0\"^^xsd:float"
],
[
"ceil(\"-1.0\"^^xsd:float)",
"\"-1e0\"^^xsd:float"
],
[
"ceil(\"-1.4\"^^xsd:float)",
"\"-1e0\"^^xsd:float"
],
[
"ceil(\"-1.5\"^^xsd:float)",
"\"-1e0\"^^xsd:float"
],
[
"ceil(\"-1.6\"^^xsd:float)",
"\"-1e0\"^^xsd:float"
],
[
"ceil(<tag:x>)",
""
],
[
"ceil(bnode())",
""
],
[
"ceil(\"42\")",
""
],
[
"ceil(\"chat\"@en)",
""
],
[
"ceil(\"chat\"@en--ltr)",
""
],
[
"ceil(\"a\"^^xsd:integer)",
""
],
[
"ceil(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"floor(042)",
"42"
],
[
"floor(1.0)",
"1.0"
],
[
"floor(1.4)",
"1.0"
],
[
"floor(1.5)",
"1.0"
],
[
"floor(1.6)",
"1.0"
],
[
"floor(-1.0)",
"-1.0"
],
[
"floor(-1.4)",
"-2.0"
],
[
"floor(-1.5)",
"-2.0"
],
[
"floor(-1.6)",
"-2.0"
],
[
"floor(1.0e0)",
"1e0"
],
[
"floor(1.4e0)",
"1e0"
],
[
"floor(1.5e0)",
"1e0"
],
[
"floor(1.6e0)",
"1e0"
],
[
"floor(-1.0e0)",
"-1e0"
],
[
"floor(-1.4e0)",
"-2e0"
],
[
"floor(-1.5e0)",
"-2e0"
],
[
"floor(-1.6e0)",
"-2e0"
],
[
"floor(\"1.0\"^^xsd:float)",
"\"1e0\"^^xsd:float"
],
[
"floor(\"1.4\"^^xsd:float)",
"\"1e0\"^^xsd:float"
],
[
"floor(\"1.5\"^^xsd:float)",
"\"1e0\"^^xsd:float"
],
[
"floor(\"1.6\"^^xsd:float)",
"\"1e0\"^^xsd:float"
],
[
"floor(\"-1.0\"^^xsd:float)",
"\"-1e0\"^^xsd:float"
],
[
"floor(\"-1.4\"^^xsd:float)",
"\"-2e0\"^^xsd:float"
],
[
"floor(\"-1.5\"^^xsd:float)",
"\"-2e0\"^^xsd:float"
],
[
"floor(\"-1.6\"^^xsd:float)",
"\"-2e0\"^^xsd:float"
],
[
"floor(<tag:x>)",
""
],
[
"floor(bnode())",
""
],
[
"floor(\"42\")",
""
],
[
"floor(\"chat\"@en)",
""
],
[
"floor(\"chat\"@en--ltr)",
""
],
[
"floor(\"a\"^^xsd:integer)",
""
],
[
"floor(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"round(042)",
"42"
],
[
"round(1.0)",
"1.0"
],
[
"round(1.4)",
"1.0"
],
[
"round(1.5)",
"2.0"
],
[
"round(1.6)",
"2.0"
],
[
"round(-1.0)",
"-1.0"
],
[
"round(-1.4)",
"-1.0"
],
[
"round(-1.5)",
"-2.0"
],
[
"round(-1.6)",
"-2.0"
],
[
"round(1.0e0)",
"1e0"
],
[
"round(1.4e0)",
"1e0"
],
[
"round(1.5e0)",
"2e0"
],
[
"round(1.6e0)",
"2e0"
],
[
"round(-1.0e0)",
"-1e0"
],
[
"round(-1.4e0)",
"-1e0"
],
[
"round(-1.5e0)",
"-2e0"
],
[
"round(-1.6e0)",
"-2e0"
],
[
"round(\"1.0\"^^xsd:float)",
"\"1e0\"^^xsd:float"
],
[
"round(\"1.4\"^^xsd:float)",
"\"1e0\"^^xsd:float"
],
[
"round(\"1.5\"^^xsd:float)",
"\"2e0\"^^xsd:float"
],
[
"round(\"1.6\"^^xsd:float)",
"\"2e0\"^^xsd:float"
],
[
"round(\"-1.0\"^^xsd:float)",
"\"-1e0\"^^xsd:float"
],
[
"round(\"-1.4\"^^xsd:float)",
"\"-1e0\"^^xsd:float"
],
[
"round(\"-1.5\"^^xsd:float)",
"\"-2e0\"^^xsd:float"
],
[
"round(\"-1.6\"^^xsd:float)",
"\"-2e0\"^^xsd:float"
],
[
"round(<tag:x>)",
""
],
[
"round(bnode())",
""
],
[
"round(\"42\")",
""
],
[
"round(\"chat\"@en)",
""
],
[
"round(\"chat\"@en--ltr)",
""
],
[
"round(\"a\"^^xsd:integer)",
""
],
[
"round(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"concat(\"foo\", \"bar\")",
"\"foobar\""
],
[
"concat(\"foo\"@en, \"bar\"@en)",
"\"foobar\"@en"
],
[
"concat(\"foo\"@en--ltr, \"bar\"@en--ltr)",
"\"foobar\"@en--ltr"
],
[
"concat(\"foo\"@en, \"bar\")",
"\"foobar\""
],
[
"concat(\"foo\", \"bar\"@en)",
"\"foobar\""
],
[
"concat(\"foo\"@en, \"bar\"@es)",
"\"foobar\""
],
[
"concat(\"foo\"@en, \"bar\"@en--ltr)",
"\"foobar\""
],
[
"concat(\"abc\")",
"\"abc\""
],
[
"concat(\"abc\"@en)",
"\"abc\"@en"
],
[
"concat(\"abc\"@en--ltr)",
"\"abc\"@en--ltr"
],
[
"concat()",
"\"\""
],
[
"concat(\"a\", \"b\", \"c\")",
"\"abc\""
],
[
"concat(\"a\", \"b\", \"c\", \"d\")",
"\"abcd\""
],
[
"concat(<tag:x>)",
""
],
[
"concat(bnode())",
""
],
[
"concat(042)",
""
],
[
"concat(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"concat(\"x\", <tag:x>)",
""
],
[
"concat(\"x\", bnode())",
""
],
[
"concat(\"x\", 042)",
""
],
[
"concat(\"x\", <<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"concat(<tag:x>, \"x\")",
""
],
[
"concat(bnode(), \"x\")",
""
],
[
"concat(042, \"x\")",
""
],
[
"concat(<<( <tag:s> <tag:p> <tag:o> )>>, \"x\")",
""
],
[
"langMatches(\"en\", \"*\")",
"true"
],
[
"langMatches(\"EN\", \"en\")",
"true"
],
[
"langMatches(\"en-UK\", \"en\")",
"true"
],
[
"langMatches(\"en-uk\", \"en-UK\")",
"true"
],
[
"langMatches(\"en-US\", \"en-UK\")",
"false"
],
[
"langMatches(\"en\", \"en-UK\")",
"false"
],
[
"langMatches(\"es\", \"en\")",
"false"
],
[
"langMatches(\"enx\", \"en\")",
"false"
],
[
"langMatches(\"\", \"en\")",
"false"
],
[
"langMatches(\"en\", \"\")",
"false"
],
[
"langMatches(\"%\", \"en\")",
"false"
],
[
"langMatches(\"en\", \"%\")",
"false"
],
[
"langMatches(<tag:x>, \"en\")",
""
],
[
"langMatches(bnode(), \"en\")",
""
],
[
"langMatches(\"en\"@en, \"en\")",
""
],
[
"langMatches(\"en\"@en--ltr, \"en\")",
""
],
[
"langMatches(42, \"en\")",
""
],
[
"langMatches(<<( <tag:s> <tag:p> <tag:o> )>>, \"en\")",
""
],
[
"langMatches(\"en\", <tag:x>)",
""
],
[
"langMatches(\"en\", bnode())",
""
],
[
"langMatches(\"en\", \"en\"@en)",
""
],
[
"langMatches(\"en\", \"en\"@en--ltr)",
""
],
[
"langMatches(\"en\", 42)",
""
],
[
"langMatches(\"en\", <<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"subStr(<tag:x>, 2)",
""
],
[
"subStr(bnode(), 2)",
""
],
[
"subStr(\"foobar\", 2)",
"\"oobar\""
],
[
"subStr(\"foobar\"@en, 2)",
"\"oobar\"@en"
],
[
"subStr(\"foobar\"@en--ltr, 2)",
"\"oobar\"@en--ltr"
],
[
"subStr(42, 2)",
""
],
[
"subStr(<<( <tag:s> <tag:p> <tag:o> )>>, 2)",
""
],
[
"subStr(\"foobar\", <tag:x>)",
""
],
[
"subStr(\"foobar\", bnode())",
""
],
[
"subStr(\"foobar\", \"42\")",
""
],
[
"subStr(\"foobar\", \"42\"@en)",
""
],
[
"subStr(\"foobar\", \"42\"@en--ltr)",
""
],
[
"subStr(\"foobar\", <<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"subStr(<tag:x>, 2, 3)",
""
],
[
"subStr(bnode(), 2, 3)",
""
],
[
"subStr(\"foobar\", 2, 3)",
"\"oob\""
],
[
"subStr(\"foobar\"@en, 2, 3)",
"\"oob\"@en"
],
[
"subStr(\"foobar\"@en--ltr, 2, 3)",
"\"oob\"@en--ltr"
],
[
"subStr(42, 2, 3)",
""
],
[
"subStr(<<( <tag:s> <tag:p> <tag:o> )>>, 2, 3)",
""
],
[
"subStr(\"foobar\", <tag:x>, 3)",
""
],
[
"subStr(\"foobar\", bnode(), 3)",
""
],
[
"subStr(\"foobar\", \"42\", 3)",
""
],
[
"subStr(\"foobar\", \"42\"@en, 3)",
""
],
[
"subStr(\"foobar\", \"42\"@en--ltr, 3)",
""
],
[
"subStr(\"foobar\", <<( <tag:s> <tag:p> <tag:o> )>>, 3)",
""
],
[
"subStr(\"foobar\", 2, <tag:x>)",
""
],
[
"subStr(\"foobar\", 2, bnode())",
""
],
[
"subStr(\"foobar\", 2, \"42\")",
""
],
[
"subStr(\"foobar\", 2, \"42\"@en)",
""
],
[
"subStr(\"foobar\", 2, \"42\"@en--ltr)",
""
],
[
"subStr(\"foobar\", 2, <<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"strLen(<tag:x>)",
""
],
[
"strLen(bnode())",
""
],
[
"strLen(\"foobar\")",
"6"
],
[
"strLen(\"foobar\"@en)",
"6"
],
[
"strLen(\"foobar\"@en--ltr)",
"6"
],
[
"strLen(42)",
""
],
[
"strLen(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"replace(<tag:x>, \".\", \"Z\")",
""
],
[
"replace(bnode(), \".\", \"Z\")",
""
],
[
"replace(\"foobar\", \".\", \"Z\")",
"\"ZZZZZZ\""
],
[
"replace(\"foobar\"@en, \".\", \"Z\")",
"\"ZZZZZZ\"@en"
],
[
"replace(\"foobar\"@en-ltr, \".\", \"Z\")",
"\"ZZZZZZ\"@en-ltr"
],
[
"replace(42, \".\", \"Z\")",
""
],
[
"replace(\"2025-01-18T12:34:56\"^^xsd:dateTime, \".\", \"Z\")",
""
],
[
"replace(\"2023-02-29T12:34:56\"^^xsd:dateTime, \".\", \"Z\")",
""
],
[
"replace(<<( <tag:s> <tag:p> <tag:o> )>>, \".\", \"Z\")",
""
],
[
"replace(\"foobarbaz\", <tag:x>, \"Z\")",
""
],
[
"replace(\"foobarbaz\", bnode(), \"Z\")",
""
],
[
"replace(\"foobarbaz\", \"foobar\", \"Z\")",
"\"Zbaz\""
],
[
"replace(\"foobarbaz\", \"foobar\"@en, \"Z\")",
""
],
[
"replace(\"foobarbaz\", \"foobar\"@en--ltr, \"Z\")",
""
],
[
"replace(\"foobarbaz\", 42, \"Z\")",
""
],
[
"replace(\"foobarbaz\", \"2025-01-18T12:34:56\"^^xsd:dateTime, \"Z\")",
""
],
[
"replace(\"foobarbaz\", \"foobar\"^^xsd:dateTime, \"Z\")",
""
],
[
"replace(\"foobarbaz\", <<( <tag:s> <tag:p> <tag:o> )>>, \"Z\")",
""
],
[
"replace(\"foobarbaz\", \"A\", <tag:x>)",
""
],
[
"replace(\"foobarbaz\", \"A\", bnode())",
""
],
[
"replace(\"foobarbaz\", \"A\", \"foobar\")",
"\"foobarbaz\""
],
[
"replace(\"foobarbaz\", \"A\", \"foobar\"@en)",
""
],
[
"replace(\"foobarbaz\", \"A\", \"foobar\"@en--ltr)",
""
],
[
"replace(\"foobarbaz\", \"A\", 42)",
""
],
[
"replace(\"foobarbaz\", \"A\", \"2025-01-18T12:34:56\"^^xsd:dateTime)",
""
],
[
"replace(\"foobarbaz\", \"A\", \"foobar\"^^xsd:dateTime)",
""
],
[
"replace(\"foobarbaz\", \"A\", <<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"replace(\"foobarbaz\", \"A\", \"Z\", <tag:x>)",
""
],
[
"replace(\"foobarbaz\", \"A\", \"Z\", bnode())",
""
],
[
"replace(\"foobarbaz\", \"A\", \"Z\", \"i\")",
"\"foobZrbZz\""
],
[
"replace(\"foobarbaz\", \"A\", \"Z\", \"i\"@en)",
""
],
[
"replace(\"foobarbaz\", \"A\", \"Z\", \"i\"@en--ltr)",
""
],
[
"replace(\"foobarbaz\", \"A\", \"Z\", 42)",
""
],
[
"replace(\"foobarbaz\", \"A\", \"Z\", \"2025-01-18T12:34:56\"^^xsd:dateTime)",
""
],
[
"replace(\"foobarbaz\", \"A\", \"Z\", \"i\"^^xsd:dateTime)",
""
],
[
"replace(\"foobarbaz\", \"A\", \"Z\", <<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"uCase(<tag:x>)",
""
],
[
"uCase(bnode())",
""
],
[
"uCase(\"fooBAR\")",
"\"FOOBAR\""
],
[
"uCase(\"fooBAR\"@en)",
"\"FOOBAR\"@en"
],
[
"uCase(\"fooBAR\"@en--ltr)",
"\"FOOBAR\"@en--ltr"
],
[
"uCase(42)",
""
],
[
"uCase(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"lCase(<tag:x>)",
""
],
[
"lCase(bnode())",
""
],
[
"lCase(\"fooBAR\")",
"\"foobar\""
],
[
"lCase(\"fooBAR\"@en)",
"\"foobar\"@en"
],
[
"lCase(\"fooBAR\"@en--ltr)",
"\"foobar\"@en--ltr"
],
[
"lCase(42)",
""
],
[
"lCase(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"encode_for_uri(<tag:x>)",
""
],
[
"encode_for_uri(bnode())",
""
],
[
"encode_for_uri(\"hello world\")",
"\"hello%20world\""
],
[
"encode_for_uri(\"hello world\"@en)",
"\"hello%20world\""
],
[
"encode_for_uri(\"hello world\"@en--ltr)",
"\"hello%20world\""
],
[
"encode_for_uri(42)",
""
],
[
"encode_for_uri(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"contains(<tag:xy>, <tag:x>)",
""
],
[
"contains(bnode(), bnode())",
""
],
[
"contains(\"hello world\", \"world\")",
"true"
],
[
"contains(\"hello world\"@en, \"world\"@en)",
"true"
],
[
"contains(\"hello world\"@en--ltr, \"world\"@en--ltr)",
"true"
],
[
"contains(42, 2)",
""
],
[
"contains(<<( <tag:s> <tag:p> <tag:o> )>>, <<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"contains(<tag:x>, \"x\")",
""
],
[
"contains(bnode(), \"\")",
""
],
[
"contains(\"hello world\"@en, \"kittie\")",
"false"
],
[
"contains(\"hello world\"@en--ltr, \"kittie\")",
"false"
],
[
"contains(42, \"2\")",
""
],
[
"contains(<<( <tag:s> <tag:p> <tag:o> )>>, \"tag:s\")",
""
],
[
"contains(\"tag:x\", <tag:x>)",
""
],
[
"contains(\"_:x\", bnode())",
""
],
[
"contains(\"hello world\", \"world\"@en)",
""
],
[
"contains(\"hello world\", \"world\"@en--ltr)",
""
],
[
"contains(\"42\", 42)",
""
],
[
"contains(\"<<( <tag:s> <tag:p> <tag:o> )>>\", <<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"strStarts(<tag:xy>, <tag:x>)",
""
],
[
"strStarts(bnode(), bnode())",
""
],
[
"strStarts(\"hello world\", \"hello\")",
"true"
],
[
"strStarts(\"hello world\"@en, \"hello\"@en)",
"true"
],
[
"strStarts(\"hello world\"@en--ltr, \"hello\"@en--ltr)",
"true"
],
[
"strStarts(42, 4)",
""
],
[
"strStarts(<<( <tag:s> <tag:p> <tag:o> )>>, <<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"strStarts(<tag:x>, \"x\")",
""
],
[
"strStarts(bnode(), \"\")",
""
],
[
"strStarts(\"hello world\"@en, \"kittie\")",
"false"
],
[
"strStarts(\"hello world\"@en--ltr, \"kittie\")",
"false"
],
[
"strStarts(42, \"4\")",
""
],
[
"strStarts(<<( <tag:s> <tag:p> <tag:o> )>>, \"tag:s\")",
""
],
[
"strStarts(\"tag:x\", <tag:x>)",
""
],
[
"strStarts(\"_:x\", bnode())",
""
],
[
"strStarts(\"hello world\", \"hello\"@en)",
""
],
[
"strStarts(\"hello world\", \"hello\"@en--ltr)",
""
],
[
"strStarts(\"42\", 42)",
""
],
[
"strStarts(\"<<( <tag:s> <tag:p> <tag:o> )>>\", <<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"strEnds(<tag:xy>, <ag:xy>)",
""
],
[
"strEnds(bnode(), bnode())",
""
],
[
"strEnds(\"hello world\", \"world\")",
"true"
],
[
"strEnds(\"hello world\"@en, \"world\"@en)",
"true"
],
[
"strEnds(\"hello world\"@en--ltr, \"world\"@en--ltr)",
"true"
],
[
"strEnds(42, 2)",
""
],
[
"strEnds(<<( <tag:s> <tag:p> <tag:o> )>>, <<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"strEnds(<tag:x>, \"t\")",
""
],
[
"strEnds(bnode(), \"\")",
""
],
[
"strEnds(\"hello world\"@en, \"kittie\")",
"false"
],
[
"strEnds(\"hello world\"@en--ltr, \"kittie\")",
"false"
],
[
"strEnds(42, \"2\")",
""
],
[
"strEnds(<<( <tag:s> <tag:p> <tag:o> )>>, \"tag:s\")",
""
],
[
"strEnds(\"tag:x\", <tag:x>)",
""
],
[
"strEnds(\"_:x\", bnode())",
""
],
[
"strEnds(\"hello world\", \"world\"@en)",
""
],
[
"strEnds(\"hello world\", \"world\"@en--ltr)",
""
],
[
"strEnds(\"42\", 42)",
""
],
[
"strEnds(\"<<( <tag:s> <tag:p> <tag:o> )>>\", <<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"strBefore(<tag:xy>, <ag:xy>)",
""
],
[
"strBefore(bnode(), bnode())",
""
],
[
"strBefore(\"hello world\", \"world\")",
"\"hello \""
],
[
"strBefore(\"hello world\"@en, \"world\"@en)",
"\"hello \"@en"
],
[
"strBefore(\"hello world\"@en--ltr, \"world\"@en--ltr)",
"\"hello \"@en--ltr"
],
[
"strBefore(42, 2)",
""
],
[
"strBefore(<<( <tag:s> <tag:p> <tag:o> )>>, <<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"strBefore(<tag:x>, \"x\")",
""
],
[
"strBefore(bnode(), \"\")",
""
],
[
"strBefore(\"hello world\"@en, \"kittie\")",
"\"\""
],
[
"strBefore(\"hello world\"@en--ltr, \"kittie\")",
"\"\""
],
[
"strBefore(42, \"2\")",
""
],
[
"strBefore(<<( <tag:s> <tag:p> <tag:o> )>>, \"tag:s\")",
""
],
[
"strBefore(\"tag:x\", <tag:x>)",
""
],
[
"strBefore(\"_:x\", bnode())",
""
],
[
"strBefore(\"hello world\", \"world\"@en)",
""
],
[
"strBefore(\"hello world\", \"world\"@en--ltr)",
""
],
[
"strBefore(\"42\", 42)",
""
],
[
"strBefore(\"<<( <tag:s> <tag:p> <tag:o> )>>\", <<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"strAfter(<tag:xy>, <ag:xy>)",
""
],
[
"strAfter(bnode(), bnode())",
""
],
[
"strAfter(\"hello world\", \"hello\")",
"\" world\""
],
[
"strAfter(\"hello world\"@en, \"hello\"@en)",
"\" world\"@en"
],
[
"strAfter(\"hello world\"@en--ltr, \"hello\"@en--ltr)",
"\" world\"@en--ltr"
],
[
"strAfter(42, 4)",
""
],
[
"strAfter(<<( <tag:s> <tag:p> <tag:o> )>>, <<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"strAfter(<tag:x>, \"t\")",
""
],
[
"strAfter(bnode(), \"\")",
""
],
[
"strAfter(\"hello world\"@en, \"kittie\")",
"\"\""
],
[
"strAfter(\"hello world\"@en--ltr, \"kittie\")",
"\"\""
],
[
"strAfter(42, \"4\")",
""
],
[
"strAfter(<<( <tag:s> <tag:p> <tag:o> )>>, \"tag:s\")",
""
],
[
"strAfter(\"tag:x\", <tag:x>)",
""
],
[
"strAfter(\"_:x\", bnode())",
""
],
[
"strAfter(\"hello world\", \"hello\"@en)",
""
],
[
"strAfter(\"hello world\", \"hello\"@en--ltr)",
""
],
[
"strAfter(\"42\", 42)",
""
],
[
"strAfter(\"<<( <tag:s> <tag:p> <tag:o> )>>\", <<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"year(<tag:x>)",
""
],
[
"year(bnode())",
""
],
[
"year(\"foobar\")",
""
],
[
"year(\"foobar\"@en)",
""
],
[
"year(\"foobar\"@en--ltr)",
""
],
[
"year(42)",
""
],
[
"year(\"2025-01-18T12:34:56\"^^xsd:dateTime)",
"2025"
],
[
"year(\"2023-02-29T12:34:56\"^^xsd:dateTime)",
""
],
[
"year(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"month(<tag:x>)",
""
],
[
"month(bnode())",
""
],
[
"month(\"foobar\")",
""
],
[
"month(\"foobar\"@en)",
""
],
[
"month(\"foobar\"@en--ltr)",
""
],
[
"month(42)",
""
],
[
"month(\"2025-01-18T12:34:56\"^^xsd:dateTime)",
"1"
],
[
"month(\"2023-02-29T12:34:56\"^^xsd:dateTime)",
""
],
[
"month(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"day(<tag:x>)",
""
],
[
"day(bnode())",
""
],
[
"day(\"foobar\")",
""
],
[
"day(\"foobar\"@en)",
""
],
[
"day(\"foobar\"@en--ltr)",
""
],
[
"day(42)",
""
],
[
"day(\"2025-01-18T12:34:56\"^^xsd:dateTime)",
"18"
],
[
"day(\"2023-02-29T12:34:56\"^^xsd:dateTime)",
""
],
[
"day(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"hours(<tag:x>)",
""
],
[
"hours(bnode())",
""
],
[
"hours(\"foobar\")",
""
],
[
"hours(\"foobar\"@en)",
""
],
[
"hours(\"foobar\"@en--ltr)",
""
],
[
"hours(42)",
""
],
[
"hours(\"2025-01-18T12:34:56\"^^xsd:dateTime)",
"12"
],
[
"hours(\"2023-02-29T12:34:56\"^^xsd:dateTime)",
""
],
[
"hours(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"minutes(<tag:x>)",
""
],
[
"minutes(bnode())",
""
],
[
"minutes(\"foobar\")",
""
],
[
"minutes(\"foobar\"@en)",
""
],
[
"minutes(\"foobar\"@en--ltr)",
""
],
[
"minutes(42)",
""
],
[
"minutes(\"2025-01-18T12:34:56\"^^xsd:dateTime)",
"34"
],
[
"minutes(\"2023-02-29T12:34:56\"^^xsd:dateTime)",
""
],
[
"minutes(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"seconds(<tag:x>)",
""
],
[
"seconds(bnode())",
""
],
[
"seconds(\"foobar\")",
""
],
[
"seconds(\"foobar\"@en)",
""
],
[
"seconds(\"foobar\"@en--ltr)",
""
],
[
"seconds(42)",
""
],
[
"seconds(\"2025-01-18T12:34:56\"^^xsd:dateTime)",
"56.0"
],
[
"seconds(\"2023-02-29T12:34:56\"^^xsd:dateTime)",
""
],
[
"seconds(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"timezone(<tag:x>)",
""
],
[
"timezone(bnode())",
""
],
[
"timezone(\"foobar\")",
""
],
[
"timezone(\"foobar\"@en)",
""
],
[
"timezone(\"foobar\"@en--ltr)",
""
],
[
"timezone(42)",
""
],
[
"timezone(\"2025-01-18T12:34:56Z\"^^xsd:dateTime)",
"\"PT0S\"^^xsd:dayTimeDuration"
],
[
"timezone(\"2023-02-29T12:34:56Z\"^^xsd:dateTime)",
""
],
[
"timezone(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"tz(<tag:x>)",
""
],
[
"tz(bnode())",
""
],
[
"tz(\"foobar\")",
""
],
[
"tz(\"foobar\"@en)",
""
],
[
"tz(\"foobar\"@en--ltr)",
""
],
[
"tz(42)",
""
],
[
"tz(\"2025-01-18T12:34:56Z\"^^xsd:dateTime)",
"\"Z\""
],
[
"tz(\"2023-02-29T12:34:56Z\"^^xsd:dateTime)",
""
],
[
"tz(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"datatype(now()) = xsd:dateTime",
"true"
],
[
"now() = now()",
"true"
],
[
"isIri(uuid())",
"true"
],
[
"regex(str(uuid()), \"^urn:uuid:[0-9a-f-]+$\", \"i\")",
"true"
],
[
"uuid() != uuid()",
"true"
],
[
"datatype(strUuid()) = xsd:string",
"true"
],
[
"regex(strUuid(), \"^[0-9a-f-]+$\", \"i\")",
"true"
],
[
"strUuid() != strUuid()",
"true"
],
[
"md5(<tag:x>)",
""
],
[
"md5(\"a b\")",
"\"0cc9cd4dd26c5137b675a0d819cb9ab0\""
],
[
"md5(\"chat\"@en)",
""
],
[
"md5(\"chat\"@en--ltr)",
""
],
[
"md5(042)",
""
],
[
"md5(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"md5(42/0)",
""
],
[
"sha1(<tag:x>)",
""
],
[
"sha1(\"a b\")",
"\"7dbde93504122a707f849f2c12bdd9de71b41929\""
],
[
"sha1(\"chat\"@en)",
""
],
[
"sha1(\"chat\"@en--ltr)",
""
],
[
"sha1(042)",
""
],
[
"sha1(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"sha1(42/0)",
""
],
[
"sha256(<tag:x>)",
""
],
[
"sha256(\"a b\")",
"\"c8687a08aa5d6ed2044328fa6a697ab8e96dc34291e8c2034ae8c38e6fcc6d65\""
],
[
"sha256(\"chat\"@en)",
""
],
[
"sha256(\"chat\"@en--ltr)",
""
],
[
"sha256(042)",
""
],
[
"sha256(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"sha256(42/0)",
""
],
[
"sha384(<tag:x>)",
""
],
[
"sha384(\"a b\")",
"\"6a6a7cf361ea861673606c8b77e34a30a24753102b3d1ff2337bd11d533c301fe6f49c9e4c1ecf54f3dcb7a833f66c27\""
],
[
"sha384(\"chat\"@en)",
""
],
[
"sha384(\"chat\"@en--ltr)",
""
],
[
"sha384(042)",
""
],
[
"sha384(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"sha384(42/0)",
""
],
[
"sha512(<tag:x>)",
""
],
[
"sha512(\"a b\")",
"\"7d42b489f17d3adadff1f4e395c03885165ea5ca63ef99a6f075b04c01011c11e14f9527b4f056eafc9f3958b91513a59b788e012263a6f792858c11007d250c\""
],
[
"sha512(\"chat\"@en)",
""
],
[
"sha512(\"chat\"@en--ltr)",
""
],
[
"sha512(042)",
""
],
[
"sha512(<<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"sha512(42/0)",
""
],
[
"strLang(<tag:xy>, \"en\")",
""
],
[
"strLang(bnode(), \"en\")",
""
],
[
"strLang(\"hello world\", \"en\")",
"\"hello world\"@en"
],
[
"strLang(\"hello world\"@en, \"en\")",
""
],
[
"strLang(\"hello world\"@en--ltr, \"en\")",
""
],
[
"strLang(42, \"en\")",
""
],
[
"strLang(<<( <tag:s> <tag:p> <tag:o> )>>, \"en\")",
""
],
[
"strLang(\"hello world\", <tag:x>)",
""
],
[
"strLang(\"hello world\", bnode())",
""
],
[
"strLang(\"hello world\", \"en\"@fr)",
""
],
[
"strLang(\"hello world\", \"en\"@fr--ltr)",
""
],
[
"strLang(\"hello world\", 42)",
""
],
[
"strLang(\"hello world\", <<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"strLangDir(<tag:xy>, \"en\", \"ltr\")",
""
],
[
"strLangDir(bnode(), \"en\", \"ltr\")",
""
],
[
"strLangDir(\"hello world\", \"en\", \"ltr\")",
"\"hello world\"@en--ltr"
],
[
"strLangDir(\"hello world\"@en, \"en\", \"ltr\")",
""
],
[
"strLangDir(\"hello world\"@en--ltr, \"en\", \"ltr\")",
""
],
[
"strLangDir(42, \"en\", \"ltr\")",
""
],
[
"strLangDir(<<( <tag:s> <tag:p> <tag:o> )>>, \"en\", \"ltr\")",
""
],
[
"strLangDir(\"hello world\", <tag:x>, \"ltr\")",
""
],
[
"strLangDir(\"hello world\", bnode(), \"ltr\")",
""
],
[
"strLangDir(\"hello world\", \"en\"@fr, \"ltr\")",
""
],
[
"strLangDir(\"hello world\", \"en\"@fr--ltr, \"ltr\")",
""
],
[
"strLangDir(\"hello world\", 42, \"ltr\")",
""
],
[
"strLangDir(\"hello world\", <<( <tag:s> <tag:p> <tag:o> )>>, \"ltr\")",
""
],
[
"strLangDir(\"hello world\", \"en\", <tag:x>)",
""
],
[
"strLangDir(\"hello world\", \"en\", bnode())",
""
],
[
"strLangDir(\"hello world\", \"en\", \"en\"@fr)",
""
],
[
"strLangDir(\"hello world\", \"en\", \"en\"@fr--ltr)",
""
],
[
"strLangDir(\"hello world\", \"en\", 42)",
""
],
[
"strLangDir(\"hello world\", \"en\", <<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"strDt(<tag:xy>, <tag:dt>)",
""
],
[
"strDt(bnode(), <tag:dt>)",
""
],
[
"strDt(\"hello world\", <tag:dt>)",
"\"hello world\"^^<tag:dt>"
],
[
"strDt(\"hello world\"@en, <tag:dt>)",
""
],
[
"strDt(\"hello world\"@en--ltr, <tag:dt>)",
""
],
[
"strDt(42, <tag:dt>)",
""
],
[
"strDt(<<( <tag:s> <tag:p> <tag:o> )>>, <tag:dt>)",
""
],
[
"strDt(\"hello world\", bnode())",
""
],
[
"strDt(\"hello world\", \"en\")",
""
],
[
"strDt(\"hello world\", \"en\"@fr)",
""
],
[
"strDt(\"hello world\", \"en\"@fr--ltr)",
""
],
[
"strDt(\"hello world\", 42)",
""
],
[
"strDt(\"hello world\", <<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"isIri(<tag:x>)",
"true"
],
[
"isIri(\"a b\")",
"false"
],
[
"isIri(\"chat\"@en)",
"false"
],
[
"isIri(\"chat\"@en--ltr)",
"false"
],
[
"isIri(042)",
"false"
],
[
"isIri(<<( <tag:s> <tag:p> <tag:o> )>>)",
"false"
],
[
"isIri(42/0)",
""
],
[
"isBlank(<tag:x>)",
"false"
],
[
"isBlank(\"a b\")",
"false"
],
[
"isBlank(\"chat\"@en)",
"false"
],
[
"isBlank(\"chat\"@en--ltr)",
"false"
],
[
"isBlank(042)",
"false"
],
[
"isBlank(<<( <tag:s> <tag:p> <tag:o> )>>)",
"false"
],
[
"isBlank(42/0)",
""
],
[
"isLiteral(<tag:x>)",
"false"
],
[
"isLiteral(\"a b\")",
"true"
],
[
"isLiteral(\"chat\"@en)",
"true"
],
[
"isLiteral(\"chat\"@en--ltr)",
"true"
],
[
"isLiteral(042)",
"true"
],
[
"isLiteral(<<( <tag:s> <tag:p> <tag:o> )>>)",
"false"
],
[
"isLiteral(42/0)",
""
],
[
"isNumeric(<tag:x>)",
"false"
],
[
"isNumeric(\"a b\")",
"false"
],
[
"isNumeric(\"chat\"@en)",
"false"
],
[
"isNumeric(\"chat\"@en--ltr)",
"false"
],
[
"isNumeric(042)",
"true"
],
[
"isNumeric(3.14)",
"true"
],
[
"isNumeric(3.14e0)",
"true"
],
[
"isNumeric(\"1\"^^xsd:float)",
"true"
],
[
"isNumeric(\"a\"^^xsd:integer)",
"false"
],
[
"isNumeric(<<( <tag:s> <tag:p> <tag:o> )>>)",
"false"
],
[
"isNumeric(42/0)",
""
],
[
"regex(<tag:x>, \".\")",
""
],
[
"regex(bnode(), \".\")",
""
],
[
"regex(\"foobar\", \".\")",
"true"
],
[
"regex(\"foobar\"@en, \".\")",
"true"
],
[
"regex(\"foobar\"@en--ltr, \".\")",
"true"
],
[
"regex(42, \".\")",
""
],
[
"regex(\"2025-01-18T12:34:56\"^^xsd:dateTime, \".\")",
""
],
[
"regex(\"2023-02-29T12:34:56\"^^xsd:dateTime, \".\")",
""
],
[
"regex(<<( <tag:s> <tag:p> <tag:o> )>>, \".\")",
""
],
[
"regex(\"foobarbaz\", <tag:x>)",
""
],
[
"regex(\"foobarbaz\", bnode())",
""
],
[
"regex(\"foobarbaz\", \"foobar\")",
"true"
],
[
"regex(\"foobarbaz\", \"foobar\"@en)",
""
],
[
"regex(\"foobarbaz\", \"foobar\"@en--ltr)",
""
],
[
"regex(\"foobarbaz\", 42)",
""
],
[
"regex(\"foobarbaz\", \"2025-01-18T12:34:56\"^^xsd:dateTime)",
""
],
[
"regex(\"foobarbaz\", \"foobar\"^^xsd:dateTime)",
""
],
[
"regex(\"foobarbaz\", <<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"regex(\"foobarbaz\", \".\", <tag:x>)",
""
],
[
"regex(\"foobarbaz\", \".\", bnode())",
""
],
[
"regex(\"foobarbaz\", \".\", \"i\")",
"true"
],
[
"regex(\"foobarbaz\", \".\", \"i\"@en)",
""
],
[
"regex(\"foobarbaz\", \".\", \"i\"@en--ltr)",
""
],
[
"regex(\"foobarbaz\", \".\", 42)",
""
],
[
"regex(\"foobarbaz\", \".\", \"2025-01-18T12:34:56\"^^xsd:dateTime)",
""
],
[
"regex(\"foobarbaz\", \".\", \"i\"^^xsd:dateTime)",
""
],
[
"regex(\"foobarbaz\", \".\", <<( <tag:s> <tag:p> <tag:o> )>>)",
""
],
[
"triple(<tag:s>, <tag:p>, <tag:o>)",
"<<( <tag:s> <tag:p> <tag:o> )>>"
],
[
"triple(<tag:s>, <tag:p>, \"o\")",
"<<( <tag:s> <tag:p> \"o\" )>>"
],
[
"isTriple(triple(bnode(), <tag:p>, <tag:o>))",
"true"
],
[
"isTriple(triple(<tag:s>, <tag:p>, bnode()))",
"true"
],
[
"triple(\"s\", <tag:p>, <tag:o>)",
""
],
[
"triple(<tag:s>, \"p\", <tag:o>)",
""
],
[
"triple(<tag:s>, bnode(), <tag:o>)",
""
],
[
"subject(<tag:x>)",
""
],
[
"subject(bnode())",
""
],
[
"subject(\"a b\")",
""
],
[
"subject(\"chat\"@en)",
""
],
[
"subject(\"chat\"@en--ltr)",
""
],
[
"subject(042)",
""
],
[
"subject(<<( <tag:s> <tag:p> <tag:o> )>>)",
"<tag:s>"
],
[
"subject(42/0)",
""
],
[
"predicate(<tag:x>)",
""
],
[
"predicate(bnode())",
""
],
[
"predicate(\"a b\")",
""
],
[
"predicate(\"chat\"@en)",
""
],
[
"predicate(\"chat\"@en--ltr)",
""
],
[
"predicate(042)",
""
],
[
"predicate(<<( <tag:s> <tag:p> <tag:o> )>>)",
"<tag:p>"
],
[
"predicate(42/0)",
""
],
[
"object(<tag:x>)",
""
],
[
"object(bnode())",
""
],
[
"object(\"a b\")",
""
],
[
"object(\"chat\"@en)",
""
],
[
"object(\"chat\"@en--ltr)",
""
],
[
"object(042)",
""
],
[
"object(<<( <tag:s> <tag:p> <tag:o> )>>)",
"<tag:o>"
],
[
"object(42/0)",
""
],
[
"isTriple(<tag:x>)",
"false"
],
[
"isTriple(bnode())",
"false"
],
[
"isTriple(\"a b\")",
"false"
],
[
"isTriple(\"chat\"@en)",
"false"
],
[
"isTriple(\"chat\"@en--ltr)",
"false"
],
[
"isTriple(042)",
"false"
],
[
"isTriple(<<( <tag:s> <tag:p> <tag:o> )>>)",
"true"
],
[
"isTriple(42/0)",
""
],
[
"xsd:boolean()",
""
],
[
"xsd:boolean(1)",
"true"
],
[
"xsd:boolean(1, 2)",
""
],
[
"xsd:double()",
""
],
[
"xsd:double(1)",
"1e0"
],
[
"xsd:double(1, 2)",
""
],
[
"xsd:float()",
""
],
[
"xsd:float(1)",
"\"1e0\"^^xsd:float"
],
[
"xsd:float(1, 2)",
""
],
[
"xsd:decimal()",
""
],
[
"xsd:decimal(1)",
"1.0"
],
[
"xsd:decimal(1, 2)",
""
],
[
"xsd:integer()",
""
],
[
"xsd:integer(1)",
"1"
],
[
"xsd:integer(1, 2)",
""
],
[
"xsd:dateTime()",
""
],
[
"xsd:dateTime(\"2025-05-20T01:02:03\")",
"\"2025-05-20T01:02:03\"^^xsd:dateTime"
],
[
"xsd:dateTime(1, 2)",
""
],
[
"xsd:string()",
""
],
[
"xsd:string(1)",
"\"1\""
],
[
"xsd:string(1, 2)",
""
]
]

#: engine-deviation skips, each with its documented reason
SKIP = {}
