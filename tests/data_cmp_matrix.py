"""Value-comparison test corpora transcribed from the reference
SPARQL suite: test_expr_eq_literal (test.rs:2004-2048),
test_expr_eq_matrix term-kind fixture (test.rs:2159-2230) and
test_expr_lt (test.rs:2232-2248).  Data only; harness in
test_cmp_matrix.py is original.
"""

EQ_LITERAL = [('42', '042', True), ('42', '42.0', True), ('42', '42e0', True), ('42.0', '42e0', True), ('42', '43', False), ('"a"', '""', False), ('"a"@en', '""@en', False), ('"a"@en', '"a"@fr', False), ('"a"@en', '"a"@en--ltr', False), ('true', 'false', False), ('"2024-03-25T00:00:00"^^xsd:dateTime', '"2024-03-25T00:00:00+00:00"^^xsd:dateTime', None), ('"2024-03-25T00:00:00Z"^^xsd:dateTime', '"2024-03-25T00:00:00+00:00"^^xsd:dateTime', True), ('"2024-03-25T00:00:00Z"^^xsd:dateTime', '"2024-03-25T01:00:00+01:00"^^xsd:dateTime', True), ('"2024-03-25T00:00:00"^^xsd:dateTime', '"2024-03-25T00:00:01"^^xsd:dateTime', False), ('"2024-03-25T00:00:00Z"^^xsd:dateTime', '"2024-03-25T00:00:01Z"^^xsd:dateTime', False), ('"2024-03-25T00:00:00Z"^^xsd:dateTime', '"2024-03-25T00:00:00+01:00"^^xsd:dateTime', False), ('"a"^^<x:dt1>', '"a"^^<x:dt2>', None), ('"a"^^<x:dt1>', '"b"^^<x:dt1>', None), ('"xyz"^^xsd:integer', '42', None)]

EQ_MATRIX = [('iri', 'iri', True), ('iri', 'bnode', False), ('iri', 'string', False), ('iri', 'langString', False), ('iri', 'dirLangString', False), ('iri', 'unrecognized', False), ('iri', 'illformed', False), ('iri', 'tterm', False), ('bnode', 'iri', False), ('bnode', 'bnode', True), ('bnode', 'string', False), ('bnode', 'langString', False), ('bnode', 'dirLangString', False), ('bnode', 'unrecognized', False), ('bnode', 'illformed', False), ('bnode', 'tterm', False), ('string', 'iri', False), ('string', 'bnode', False), ('string', 'string', True), ('string', 'langString', False), ('string', 'dirLangString', False), ('string', 'unrecognized', None), ('string', 'illformed', None), ('string', 'tterm', False), ('langString', 'iri', False), ('langString', 'bnode', False), ('langString', 'string', False), ('langString', 'langString', True), ('langString', 'dirLangString', False), ('langString', 'unrecognized', None), ('langString', 'illformed', None), ('langString', 'tterm', False), ('dirLangString', 'iri', False), ('dirLangString', 'bnode', False), ('dirLangString', 'string', False), ('dirLangString', 'langString', False), ('dirLangString', 'dirLangString', True), ('dirLangString', 'unrecognized', None), ('dirLangString', 'illformed', None), ('dirLangString', 'tterm', False), ('unrecognized', 'iri', False), ('unrecognized', 'bnode', False), ('unrecognized', 'string', None), ('unrecognized', 'langString', None), ('unrecognized', 'dirLangString', None), ('unrecognized', 'unrecognized', True), ('unrecognized', 'illformed', None), ('unrecognized', 'tterm', False), ('illformed', 'iri', False), ('illformed', 'bnode', False), ('illformed', 'string', None), ('illformed', 'langString', None), ('illformed', 'dirLangString', None), ('illformed', 'unrecognized', None), ('illformed', 'illformed', True), ('illformed', 'tterm', False), ('tterm', 'iri', False), ('tterm', 'bnode', False), ('tterm', 'string', False), ('tterm', 'langString', False), ('tterm', 'dirLangString', False), ('tterm', 'unrecognized', False), ('tterm', 'illformed', False), ('tterm', 'tterm', True), ('iri', 'iri2', False), ('bnode', 'bnode2', False), ('string', 'string2', False), ('langString', 'langString2', False), ('dirLangString', 'dirLangString2', False), ('unrecognized', 'unrecognized2', None), ('illformed', 'illformed2', None), ('tterm', 'tterm2', False)]

LT = [('42', '43'), ('42', '43.0'), ('42', '43e0'), ('42.0', '43e0'), ('""', '"a"'), ('"a"', '"ab"'), ('"a"', '"b"'), ('"10"', '"2"'), ('""@en', '"a"@en'), ('"a"@en', '"ab"@en'), ('"a"@en', '"b"@en'), ('"10"@en', '"b"@en'), ('""@en--ltr', '"a"@en--ltr'), ('"a"@en--ltr', '"ab"@en--ltr'), ('"a"@en--ltr', '"b"@en--ltr'), ('"10"@en--ltr', '"b"@en--ltr'), ('false', 'true'), ('"2024-03-25T00:00:00Z"^^xsd:dateTime', '"2024-03-25T00:00:01Z"^^xsd:dateTime')]

#: <x:NAME> :p TERM fixture of test_expr_eq_matrix, as NT text
FIXTURE = {
 "iri": "<x:xyz>",
 "bnode": "_:xyz",
 "string": '"xyz"',
 "langString": '"xyz"@en',
 "dirLangString": '"xyz"@en--ltr',
 "unrecognized": '"xyz"^^<x:unrecognized>',
 "illformed": '"xyz"^^<http://www.w3.org/2001/XMLSchema#integer>',
 "tterm": '<<( _:xyz <x:xyz> "xyz" )>>',
 "iri2": "<x:xyz2>",
 "bnode2": "_:xyz2",
 "string2": '"xyz2"',
 "langString2": '"xyz2"@en',
 "dirLangString2": '"xyz2"@en--ltr',
 "unrecognized2": '"xyz2"^^<x:unrecognized>',
 "illformed2": '"xyz2"^^<http://www.w3.org/2001/XMLSchema#integer>',
 "tterm2": '<<( _:xyz <x:xyz> "xyz2" )>>',
}
