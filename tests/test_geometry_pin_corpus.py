"""Geometry value-pin corpus — MECHANICALLY EXTRACTED from
presto-geospatial's TestGeoFunctions/TestBingTileFunctions/
TestSphericalGeoFunctions/TestGeoRelations (the r11 extraction
methodology applied to the plugin suite). 155 pins covering the NEW
SQL-surface geometry family: the DataFrame path keeps the
Column-expression engine in functions/geo.py; the SQL front door now
resolves ST_GeometryFromText / ST_AsText / ST_Point / ST_X/Y /
ST_XMin/XMax/YMin/YMax / ST_Envelope / ST_GeometryType / ST_IsClosed/
IsEmpty/IsRing / ST_Length / ST_Area / ST_Centroid / ST_Boundary /
ST_NumInteriorRing / ST_ExteriorRing / ST_Start/EndPoint /
ST_Distance (all planar type pairs) / expand_envelope /
line_locate_point /
great_circle_distance (Vincenty, R=6371.01) and the Bing tile family
(quadkey-string representation; coordinates as a named struct),
backed by the pure-Python WKT engine in functions/geo_wkt.py and
registered as Arrow-batched pandas UDFs.

Excluded (63 of 218 extracted, by reason):
- unresolved: ST_Buffer / ST_Intersection / ST_Difference /
  ST_SymDifference / ST_Relate / ST_IsValid / geometry_invalid_reason
  / simplify_geometry / geometry_to_bing_tiles /
  to_spherical_geography — the boolean-ops/DE-9IM tail, out of scope
  this round (functions/geo_clip.py carries polygon boolean ops on
  the DataFrame path); listed as the r12 candidate in NOTES.
- 20 engine limitation: Spark refuses Python UDFs inside
  higher-order-function lambdas (UNSUPPORTED_FEATURE.LAMBDA_FUNCTION_
  WITH_PYTHON_UDF) — the reference tests wrap tile polygons in
  apply(g -> ...) lambdas.
- 1 value: ST_Centroid of a Bing tile polygon differs from ESRI in
  the last ulp of the latitude (shortest-repr prints one more digit).
- 1 raise-vs-raise: line_locate_point over MULTILINESTRING errors on
  both engines (type check), counted here as excluded because the
  harness compares values.
"""

from __future__ import annotations

import math
import re

import pytest

from presto_0_235_spark.sql.frontend import run_sql

# (reference file, line, declared type, expression, expected)
CASES = [
    ('TestGeoFunctions.java', 127, 'VARCHAR', 'ST_AsText(ST_Point(1, 4))', 'POINT (1 4)'),
    ('TestGeoFunctions.java', 128, 'VARCHAR', 'ST_AsText(ST_Point(122.3, 10.55))', 'POINT (122.3 10.55)'),
    ('TestGeoFunctions.java', 134, 'VARCHAR', "ST_AsText(ST_LineFromText('LINESTRING EMPTY'))", 'LINESTRING EMPTY'),
    ('TestGeoFunctions.java', 135, 'VARCHAR', "ST_AsText(ST_LineFromText('LINESTRING (1 1, 2 2, 1 3)'))", 'LINESTRING (1 1, 2 2, 1 3)'),
    ('TestGeoFunctions.java', 145, 'VARCHAR', "ST_AsText(ST_Polygon('POLYGON EMPTY'))", 'POLYGON EMPTY'),
    ('TestGeoFunctions.java', 146, 'VARCHAR', "ST_AsText(ST_Polygon('POLYGON ((1 1, 1 4, 4 4, 4 1, 1 1))'))", 'POLYGON ((1 1, 1 4, 4 4, 4 1, 1 1))'),
    ('TestGeoFunctions.java', 339, 'BOOLEAN', "ST_IsClosed(ST_GeometryFromText('LINESTRING (1 1, 2 2, 1 3, 1 1)'))", True),
    ('TestGeoFunctions.java', 340, 'BOOLEAN', "ST_IsClosed(ST_GeometryFromText('LINESTRING (1 1, 2 2, 1 3)'))", False),
    ('TestGeoFunctions.java', 341, 'BOOLEAN', "ST_IsClosed(ST_GeometryFromText('MULTILINESTRING ((1 1, 2 2, 1 3, 1 1), (4 4, 5 5))'))", False),
    ('TestGeoFunctions.java', 342, 'BOOLEAN', "ST_IsClosed(ST_GeometryFromText('MULTILINESTRING ((1 1, 2 2, 1 3, 1 1), (4 4, 5 4, 5 5, 4 5, 4 4))'))", True),
    ('TestGeoFunctions.java', 349, 'BOOLEAN', "ST_IsEmpty(ST_GeometryFromText('POINT (1.5 2.5)'))", False),
    ('TestGeoFunctions.java', 350, 'BOOLEAN', "ST_IsEmpty(ST_GeometryFromText('POLYGON EMPTY'))", True),
    ('TestGeoFunctions.java', 478, 'DOUBLE', "ST_Length(ST_GeometryFromText('LINESTRING EMPTY'))", 0.0),
    ('TestGeoFunctions.java', 479, 'DOUBLE', "ST_Length(ST_GeometryFromText('LINESTRING (0 0, 2 2)'))", 2.8284271247461903),
    ('TestGeoFunctions.java', 480, 'DOUBLE', "ST_Length(ST_GeometryFromText('MULTILINESTRING ((1 1, 5 1), (2 4, 4 4))'))", 6.0),
    ('TestGeoFunctions.java', 487, 'DOUBLE', "line_locate_point(ST_GeometryFromText('LINESTRING (0 0, 0 1)'), ST_Point(0, 0.2))", 0.2),
    ('TestGeoFunctions.java', 488, 'DOUBLE', "line_locate_point(ST_GeometryFromText('LINESTRING (0 0, 0 1)'), ST_Point(0, 0))", 0.0),
    ('TestGeoFunctions.java', 489, 'DOUBLE', "line_locate_point(ST_GeometryFromText('LINESTRING (0 0, 0 1)'), ST_Point(0, -1))", 0.0),
    ('TestGeoFunctions.java', 490, 'DOUBLE', "line_locate_point(ST_GeometryFromText('LINESTRING (0 0, 0 1)'), ST_Point(0, 1))", 1.0),
    ('TestGeoFunctions.java', 491, 'DOUBLE', "line_locate_point(ST_GeometryFromText('LINESTRING (0 0, 0 1)'), ST_Point(0, 2))", 1.0),
    ('TestGeoFunctions.java', 492, 'DOUBLE', "line_locate_point(ST_GeometryFromText('LINESTRING (0 0, 0 1, 2 1)'), ST_Point(0, 0.2))", 0.06666666666666667),
    ('TestGeoFunctions.java', 493, 'DOUBLE', "line_locate_point(ST_GeometryFromText('LINESTRING (0 0, 0 1, 2 1)'), ST_Point(0.9, 1))", 0.6333333333333333),
    ('TestGeoFunctions.java', 494, 'DOUBLE', "line_locate_point(ST_GeometryFromText('LINESTRING (1 3, 5 4)'), ST_Point(1, 3))", 0.0),
    ('TestGeoFunctions.java', 495, 'DOUBLE', "line_locate_point(ST_GeometryFromText('LINESTRING (1 3, 5 4)'), ST_Point(2, 3))", 0.23529411764705882),
    ('TestGeoFunctions.java', 496, 'DOUBLE', "line_locate_point(ST_GeometryFromText('LINESTRING (1 3, 5 4)'), ST_Point(5, 4))", 1.0),
    ('TestGeoFunctions.java', 499, 'DOUBLE', "line_locate_point(ST_GeometryFromText('LINESTRING EMPTY'), ST_Point(0, 1))", None),
    ('TestGeoFunctions.java', 500, 'DOUBLE', "line_locate_point(ST_GeometryFromText('LINESTRING (0 0, 0 1, 2 1)'), ST_GeometryFromText('POINT EMPTY'))", None),
    ('TestGeoFunctions.java', 533, 'DOUBLE', "ST_XMax(ST_GeometryFromText('POINT (1.5 2.5)'))", 1.5),
    ('TestGeoFunctions.java', 534, 'DOUBLE', "ST_YMax(ST_GeometryFromText('POINT (1.5 2.5)'))", 2.5),
    ('TestGeoFunctions.java', 535, 'DOUBLE', "ST_XMax(ST_GeometryFromText('MULTIPOINT (1 2, 2 4, 3 6, 4 8)'))", 4.0),
    ('TestGeoFunctions.java', 536, 'DOUBLE', "ST_YMax(ST_GeometryFromText('MULTIPOINT (1 2, 2 4, 3 6, 4 8)'))", 8.0),
    ('TestGeoFunctions.java', 537, 'DOUBLE', "ST_XMax(ST_GeometryFromText('LINESTRING (8 4, 5 7)'))", 8.0),
    ('TestGeoFunctions.java', 538, 'DOUBLE', "ST_YMax(ST_GeometryFromText('LINESTRING (8 4, 5 7)'))", 7.0),
    ('TestGeoFunctions.java', 539, 'DOUBLE', "ST_XMax(ST_GeometryFromText('MULTILINESTRING ((1 1, 5 1), (2 4, 4 4))'))", 5.0),
    ('TestGeoFunctions.java', 540, 'DOUBLE', "ST_YMax(ST_GeometryFromText('MULTILINESTRING ((1 1, 5 1), (2 4, 4 4))'))", 4.0),
    ('TestGeoFunctions.java', 541, 'DOUBLE', "ST_XMax(ST_GeometryFromText('POLYGON ((2 0, 2 1, 3 1, 2 0))'))", 3.0),
    ('TestGeoFunctions.java', 542, 'DOUBLE', "ST_YMax(ST_GeometryFromText('POLYGON ((2 0, 2 1, 3 1, 2 0))'))", 1.0),
    ('TestGeoFunctions.java', 543, 'DOUBLE', "ST_XMax(ST_GeometryFromText('MULTIPOLYGON (((1 1, 1 3, 3 3, 3 1, 1 1)), ((2 4, 2 6, 6 6, 6 4, 2 4)))'))", 6.0),
    ('TestGeoFunctions.java', 544, 'DOUBLE', "ST_YMax(ST_GeometryFromText('MULTIPOLYGON (((1 1, 1 3, 3 3, 3 1, 1 1)), ((2 4, 2 6, 6 10, 6 4, 2 4)))'))", 10.0),
    ('TestGeoFunctions.java', 545, 'DOUBLE', "ST_XMax(ST_GeometryFromText('POLYGON EMPTY'))", None),
    ('TestGeoFunctions.java', 546, 'DOUBLE', "ST_YMax(ST_GeometryFromText('POLYGON EMPTY'))", None),
    ('TestGeoFunctions.java', 547, 'DOUBLE', "ST_XMax(ST_GeometryFromText('GEOMETRYCOLLECTION (POINT (5 1), LINESTRING (3 4, 4 4))'))", 5.0),
    ('TestGeoFunctions.java', 548, 'DOUBLE', "ST_YMax(ST_GeometryFromText('GEOMETRYCOLLECTION (POINT (5 1), LINESTRING (3 4, 4 4))'))", 4.0),
    ('TestGeoFunctions.java', 549, 'DOUBLE', 'ST_XMax(null)', None),
    ('TestGeoFunctions.java', 550, 'DOUBLE', 'ST_YMax(null)', None),
    ('TestGeoFunctions.java', 556, 'DOUBLE', "ST_XMin(ST_GeometryFromText('POINT (1.5 2.5)'))", 1.5),
    ('TestGeoFunctions.java', 557, 'DOUBLE', "ST_YMin(ST_GeometryFromText('POINT (1.5 2.5)'))", 2.5),
    ('TestGeoFunctions.java', 558, 'DOUBLE', "ST_XMin(ST_GeometryFromText('MULTIPOINT (1 2, 2 4, 3 6, 4 8)'))", 1.0),
    ('TestGeoFunctions.java', 559, 'DOUBLE', "ST_YMin(ST_GeometryFromText('MULTIPOINT (1 2, 2 4, 3 6, 4 8)'))", 2.0),
    ('TestGeoFunctions.java', 560, 'DOUBLE', "ST_XMin(ST_GeometryFromText('LINESTRING (8 4, 5 7)'))", 5.0),
    ('TestGeoFunctions.java', 561, 'DOUBLE', "ST_YMin(ST_GeometryFromText('LINESTRING (8 4, 5 7)'))", 4.0),
    ('TestGeoFunctions.java', 562, 'DOUBLE', "ST_XMin(ST_GeometryFromText('MULTILINESTRING ((1 1, 5 1), (2 4, 4 4))'))", 1.0),
    ('TestGeoFunctions.java', 563, 'DOUBLE', "ST_YMin(ST_GeometryFromText('MULTILINESTRING ((1 2, 5 3), (2 4, 4 4))'))", 2.0),
    ('TestGeoFunctions.java', 564, 'DOUBLE', "ST_XMin(ST_GeometryFromText('POLYGON ((2 0, 2 1, 3 1, 2 0))'))", 2.0),
    ('TestGeoFunctions.java', 565, 'DOUBLE', "ST_YMin(ST_GeometryFromText('POLYGON ((2 0, 2 1, 3 1, 2 0))'))", 0.0),
    ('TestGeoFunctions.java', 566, 'DOUBLE', "ST_XMin(ST_GeometryFromText('MULTIPOLYGON (((1 10, 1 3, 3 3, 3 10, 1 10)), ((2 4, 2 6, 6 6, 6 4, 2 4)))'))", 1.0),
    ('TestGeoFunctions.java', 567, 'DOUBLE', "ST_YMin(ST_GeometryFromText('MULTIPOLYGON (((1 10, 1 3, 3 3, 3 10, 1 10)), ((2 4, 2 6, 6 10, 6 4, 2 4)))'))", 3.0),
    ('TestGeoFunctions.java', 568, 'DOUBLE', "ST_XMin(ST_GeometryFromText('POLYGON EMPTY'))", None),
    ('TestGeoFunctions.java', 569, 'DOUBLE', "ST_YMin(ST_GeometryFromText('POLYGON EMPTY'))", None),
    ('TestGeoFunctions.java', 570, 'DOUBLE', "ST_XMin(ST_GeometryFromText('GEOMETRYCOLLECTION (POINT (5 1), LINESTRING (3 4, 4 4))'))", 3.0),
    ('TestGeoFunctions.java', 571, 'DOUBLE', "ST_YMin(ST_GeometryFromText('GEOMETRYCOLLECTION (POINT (5 1), LINESTRING (3 4, 4 4))'))", 1.0),
    ('TestGeoFunctions.java', 572, 'DOUBLE', 'ST_XMin(null)', None),
    ('TestGeoFunctions.java', 573, 'DOUBLE', 'ST_YMin(null)', None),
    ('TestGeoFunctions.java', 579, 'BIGINT', "ST_NumInteriorRing(ST_GeometryFromText('POLYGON ((0 0, 0 5, 5 5, 5 0, 0 0))'))", 0),
    ('TestGeoFunctions.java', 580, 'BIGINT', "ST_NumInteriorRing(ST_GeometryFromText('POLYGON ((0 0, 8 0, 0 8, 0 0), (1 1, 1 5, 5 1, 1 1))'))", 1),
    ('TestGeoFunctions.java', 612, 'BOOLEAN', "ST_IsRing(ST_GeometryFromText('LINESTRING (8 4, 4 8)'))", False),
    ('TestGeoFunctions.java', 613, 'BOOLEAN', "ST_IsRing(ST_GeometryFromText('LINESTRING (0 0, 1 1, 0 2, 0 0)'))", True),
    ('TestGeoFunctions.java', 620, 'VARCHAR', "ST_AsText(ST_StartPoint(ST_GeometryFromText('LINESTRING (8 4, 4 8, 5 6)')))", 'POINT (8 4)'),
    ('TestGeoFunctions.java', 621, 'VARCHAR', "ST_AsText(ST_EndPoint(ST_GeometryFromText('LINESTRING (8 4, 4 8, 5 6)')))", 'POINT (5 6)'),
    ('TestGeoFunctions.java', 685, 'DOUBLE', "ST_Y(ST_GeometryFromText('POINT EMPTY'))", None),
    ('TestGeoFunctions.java', 686, 'DOUBLE', "ST_X(ST_GeometryFromText('POINT (1 2)'))", 1.0),
    ('TestGeoFunctions.java', 687, 'DOUBLE', "ST_Y(ST_GeometryFromText('POINT (1 2)'))", 2.0),
    ('TestGeoFunctions.java', 694, 'VARCHAR', "ST_AsText(ST_Boundary(ST_GeometryFromText('POINT (1 2)')))", 'GEOMETRYCOLLECTION EMPTY'),
    ('TestGeoFunctions.java', 695, 'VARCHAR', "ST_AsText(ST_Boundary(ST_GeometryFromText('MULTIPOINT (1 2, 2 4, 3 6, 4 8)')))", 'GEOMETRYCOLLECTION EMPTY'),
    ('TestGeoFunctions.java', 696, 'VARCHAR', "ST_AsText(ST_Boundary(ST_GeometryFromText('LINESTRING EMPTY')))", 'MULTIPOINT EMPTY'),
    ('TestGeoFunctions.java', 697, 'VARCHAR', "ST_AsText(ST_Boundary(ST_GeometryFromText('LINESTRING (8 4, 5 7)')))", 'MULTIPOINT ((8 4), (5 7))'),
    ('TestGeoFunctions.java', 698, 'VARCHAR', "ST_AsText(ST_Boundary(ST_GeometryFromText('LINESTRING (100 150,50 60, 70 80, 160 170)')))", 'MULTIPOINT ((100 150), (160 170))'),
    ('TestGeoFunctions.java', 699, 'VARCHAR', "ST_AsText(ST_Boundary(ST_GeometryFromText('MULTILINESTRING ((1 1, 5 1), (2 4, 4 4))')))", 'MULTIPOINT ((1 1), (2 4), (4 4), (5 1))'),
    ('TestGeoFunctions.java', 700, 'VARCHAR', "ST_AsText(ST_Boundary(ST_GeometryFromText('POLYGON ((1 1, 4 1, 1 4, 1 1))')))", 'LINESTRING (1 1, 1 4, 4 1, 1 1)'),
    ('TestGeoFunctions.java', 701, 'VARCHAR', "ST_AsText(ST_Boundary(ST_GeometryFromText('MULTIPOLYGON (((1 1, 1 3, 3 3, 3 1, 1 1)), ((0 0, 0 2, 2 2, 2 0, 0 0)))')))", 'MULTILINESTRING ((1 1, 1 3, 3 3, 3 1, 1 1), (0 0, 0 2, 2 2, 2 0, 0 0))'),
    ('TestGeoFunctions.java', 707, 'VARCHAR', "ST_AsText(ST_Envelope(ST_GeometryFromText('MULTIPOINT (1 2, 2 4, 3 6, 4 8)')))", 'POLYGON ((1 2, 1 8, 4 8, 4 2, 1 2))'),
    ('TestGeoFunctions.java', 708, 'VARCHAR', "ST_AsText(ST_Envelope(ST_GeometryFromText('LINESTRING EMPTY')))", 'POLYGON EMPTY'),
    ('TestGeoFunctions.java', 709, 'VARCHAR', "ST_AsText(ST_Envelope(ST_GeometryFromText('LINESTRING (1 1, 2 2, 1 3)')))", 'POLYGON ((1 1, 1 3, 2 3, 2 1, 1 1))'),
    ('TestGeoFunctions.java', 710, 'VARCHAR', "ST_AsText(ST_Envelope(ST_GeometryFromText('LINESTRING (8 4, 5 7)')))", 'POLYGON ((5 4, 5 7, 8 7, 8 4, 5 4))'),
    ('TestGeoFunctions.java', 711, 'VARCHAR', "ST_AsText(ST_Envelope(ST_GeometryFromText('MULTILINESTRING ((1 1, 5 1), (2 4, 4 4))')))", 'POLYGON ((1 1, 1 4, 5 4, 5 1, 1 1))'),
    ('TestGeoFunctions.java', 712, 'VARCHAR', "ST_AsText(ST_Envelope(ST_GeometryFromText('POLYGON ((1 1, 4 1, 1 4, 1 1))')))", 'POLYGON ((1 1, 1 4, 4 4, 4 1, 1 1))'),
    ('TestGeoFunctions.java', 713, 'VARCHAR', "ST_AsText(ST_Envelope(ST_GeometryFromText('MULTIPOLYGON (((1 1, 1 3, 3 3, 3 1, 1 1)), ((0 0, 0 2, 2 2, 2 0, 0 0)))')))", 'POLYGON ((0 0, 0 3, 3 3, 3 0, 0 0))'),
    ('TestGeoFunctions.java', 714, 'VARCHAR', "ST_AsText(ST_Envelope(ST_GeometryFromText('GEOMETRYCOLLECTION (POINT (5 1), LINESTRING (3 4, 4 4))')))", 'POLYGON ((3 1, 3 4, 5 4, 5 1, 3 1))'),
    ('TestGeoFunctions.java', 739, 'BOOLEAN', "ST_IsEmpty(expand_envelope(ST_GeometryFromText('POINT EMPTY'), 1))", True),
    ('TestGeoFunctions.java', 740, 'BOOLEAN', "ST_IsEmpty(expand_envelope(ST_GeometryFromText('POLYGON EMPTY'), 1))", True),
    ('TestGeoFunctions.java', 741, 'VARCHAR', 'ST_AsText(expand_envelope(ST_Envelope(ST_Point(1, 10)), 3))', 'POLYGON ((-2 7, -2 13, 4 13, 4 7, -2 7))'),
    ('TestGeoFunctions.java', 742, 'VARCHAR', 'ST_AsText(expand_envelope(ST_Point(1, 10), 3))', 'POLYGON ((-2 7, -2 13, 4 13, 4 7, -2 7))'),
    ('TestGeoFunctions.java', 743, 'VARCHAR', "ST_AsText(expand_envelope(ST_GeometryFromText('LINESTRING (1 10, 3 15)'), 2))", 'POLYGON ((-1 8, -1 17, 5 17, 5 8, -1 8))'),
    ('TestGeoFunctions.java', 744, 'VARCHAR', "ST_AsText(expand_envelope(ST_GeometryFromText('GEOMETRYCOLLECTION (POINT (5 1), LINESTRING (3 4, 4 4))'), 1))", 'POLYGON ((2 0, 2 5, 6 5, 6 0, 2 0))'),
    ('TestGeoFunctions.java', 748, 'VARCHAR', 'ST_AsText(expand_envelope(ST_Point(0, 0), infinity()))', 'POLYGON EMPTY'),
    ('TestGeoFunctions.java', 768, 'DOUBLE', 'ST_Distance(ST_Point(50, 100), ST_Point(150, 150))', 111.80339887498948),
    ('TestGeoFunctions.java', 769, 'DOUBLE', "ST_Distance(ST_Point(50, 100), ST_GeometryFromText('POINT (150 150)'))", 111.80339887498948),
    ('TestGeoFunctions.java', 770, 'DOUBLE', "ST_Distance(ST_GeometryFromText('POINT (50 100)'), ST_GeometryFromText('POINT (150 150)'))", 111.80339887498948),
    ('TestGeoFunctions.java', 771, 'DOUBLE', "ST_Distance(ST_GeometryFromText('MULTIPOINT (50 100, 50 200)'), ST_GeometryFromText('Point (50 100)'))", 0.0),
    ('TestGeoFunctions.java', 772, 'DOUBLE', "ST_Distance(ST_GeometryFromText('LINESTRING (50 100, 50 200)'), ST_GeometryFromText('LINESTRING (10 10, 20 20)'))", 85.44003745317531),
    ('TestGeoFunctions.java', 773, 'DOUBLE', "ST_Distance(ST_GeometryFromText('MULTILINESTRING ((1 1, 5 1), (2 4, 4 4))'), ST_GeometryFromText('LINESTRING (10 20, 20 50)'))", 17.08800749063506),
    ('TestGeoFunctions.java', 774, 'DOUBLE', "ST_Distance(ST_GeometryFromText('POLYGON ((1 1, 1 3, 3 3, 3 1, 1 1))'), ST_GeometryFromText('POLYGON ((4 4, 4 5, 5 5, 5 4, 4 4))'))", 1.4142135623730951),
    ('TestGeoFunctions.java', 775, 'DOUBLE', "ST_Distance(ST_GeometryFromText('MULTIPOLYGON (((1 1, 1 3, 3 3, 3 1, 1 1)), ((0 0, 0 2, 2 2, 2 0, 0 0)))'), ST_GeometryFromText('POLYGON ((10 100, 30 10, 30 100, 10 100))'))", 27.892651361962706),
    ('TestGeoFunctions.java', 777, 'DOUBLE', "ST_Distance(ST_GeometryFromText('POINT EMPTY'), ST_Point(150, 150))", None),
    ('TestGeoFunctions.java', 778, 'DOUBLE', "ST_Distance(ST_Point(50, 100), ST_GeometryFromText('POINT EMPTY'))", None),
    ('TestGeoFunctions.java', 779, 'DOUBLE', "ST_Distance(ST_GeometryFromText('POINT EMPTY'), ST_GeometryFromText('POINT EMPTY'))", None),
    ('TestGeoFunctions.java', 780, 'DOUBLE', "ST_Distance(ST_GeometryFromText('MULTIPOINT EMPTY'), ST_GeometryFromText('Point (50 100)'))", None),
    ('TestGeoFunctions.java', 781, 'DOUBLE', "ST_Distance(ST_GeometryFromText('LINESTRING (50 100, 50 200)'), ST_GeometryFromText('LINESTRING EMPTY'))", None),
    ('TestGeoFunctions.java', 782, 'DOUBLE', "ST_Distance(ST_GeometryFromText('MULTILINESTRING EMPTY'), ST_GeometryFromText('LINESTRING (10 20, 20 50)'))", None),
    ('TestGeoFunctions.java', 783, 'DOUBLE', "ST_Distance(ST_GeometryFromText('POLYGON ((1 1, 1 3, 3 3, 3 1, 1 1))'), ST_GeometryFromText('POLYGON EMPTY'))", None),
    ('TestGeoFunctions.java', 784, 'DOUBLE', "ST_Distance(ST_GeometryFromText('MULTIPOLYGON EMPTY'), ST_GeometryFromText('POLYGON ((10 100, 30 10, 30 100, 10 100))'))", None),
    ('TestGeoFunctions.java', 790, 'VARCHAR', "ST_AsText(ST_ExteriorRing(ST_GeometryFromText('POLYGON EMPTY')))", None),
    ('TestGeoFunctions.java', 791, 'VARCHAR', "ST_AsText(ST_ExteriorRing(ST_GeometryFromText('POLYGON ((1 1, 1 4, 4 1, 1 1))')))", 'LINESTRING (1 1, 1 4, 4 1, 1 1)'),
    ('TestGeoFunctions.java', 792, 'VARCHAR', "ST_AsText(ST_ExteriorRing(ST_GeometryFromText('POLYGON ((0 0, 0 5, 5 5, 5 0, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))')))", 'LINESTRING (0 0, 0 5, 5 5, 5 0, 0 0)'),
    ('TestGeoFunctions.java', 1182, 'VARCHAR', 'ST_GeometryType(ST_Point(1, 4))', 'ST_Point'),
    ('TestGeoFunctions.java', 1183, 'VARCHAR', "ST_GeometryType(ST_GeometryFromText('LINESTRING (1 1, 2 2)'))", 'ST_LineString'),
    ('TestGeoFunctions.java', 1184, 'VARCHAR', "ST_GeometryType(ST_GeometryFromText('POLYGON ((1 1, 1 4, 4 4, 4 1, 1 1))'))", 'ST_Polygon'),
    ('TestGeoFunctions.java', 1185, 'VARCHAR', "ST_GeometryType(ST_GeometryFromText('MULTIPOINT (1 1, 2 2)'))", 'ST_MultiPoint'),
    ('TestGeoFunctions.java', 1186, 'VARCHAR', "ST_GeometryType(ST_GeometryFromText('MULTILINESTRING ((1 1, 2 2), (3 3, 4 4))'))", 'ST_MultiLineString'),
    ('TestGeoFunctions.java', 1187, 'VARCHAR', "ST_GeometryType(ST_GeometryFromText('MULTIPOLYGON (((1 1, 1 4, 4 4, 4 1, 1 1)), ((1 1, 1 4, 4 4, 4 1, 1 1)))'))", 'ST_MultiPolygon'),
    ('TestGeoFunctions.java', 1188, 'VARCHAR', "ST_GeometryType(ST_GeometryFromText('GEOMETRYCOLLECTION(POINT(4 6),LINESTRING(4 6, 7 10))'))", 'ST_GeomCollection'),
    ('TestGeoFunctions.java', 1189, 'VARCHAR', "ST_GeometryType(ST_Envelope(ST_GeometryFromText('LINESTRING (1 1, 2 2)')))", 'ST_Polygon'),
    ('TestBingTileFunctions.java', 145, 'VARCHAR', "bing_tile_quadkey(bing_tile(''))", ''),
    ('TestBingTileFunctions.java', 146, 'VARCHAR', "bing_tile_quadkey(bing_tile('213'))", '213'),
    ('TestBingTileFunctions.java', 147, 'VARCHAR', "bing_tile_quadkey(bing_tile('123030123010121'))", '123030123010121'),
    ('TestBingTileFunctions.java', 149, 'VARCHAR', 'bing_tile_quadkey(bing_tile(0, 0, 0))', ''),
    ('TestBingTileFunctions.java', 150, 'VARCHAR', 'bing_tile_quadkey(bing_tile(3, 5, 3))', '213'),
    ('TestBingTileFunctions.java', 151, 'VARCHAR', 'bing_tile_quadkey(bing_tile(21845, 13506, 15))', '123030123010121'),
    ('TestBingTileFunctions.java', 187, 'INTEGER', "bing_tile_coordinates(bing_tile('213')).x", 3),
    ('TestBingTileFunctions.java', 188, 'INTEGER', "bing_tile_coordinates(bing_tile('213')).y", 5),
    ('TestBingTileFunctions.java', 189, 'INTEGER', "bing_tile_coordinates(bing_tile('123030123010121')).x", 21845),
    ('TestBingTileFunctions.java', 190, 'INTEGER', "bing_tile_coordinates(bing_tile('123030123010121')).y", 13506),
    ('TestBingTileFunctions.java', 437, 'VARCHAR', "ST_AsText(bing_tile_polygon(bing_tile('123030123010121')))", 'POLYGON ((59.996337890625 30.11662158281937, 59.996337890625 30.12612436422458, 60.00732421875 30.12612436422458, 60.00732421875 30.11662158281937, 59.996337890625 30.11662158281937))'),
    ('TestBingTileFunctions.java', 554, 'BOOLEAN', 'bing_tile(3, 5, 3) = bing_tile(3, 5, 3)', True),
    ('TestBingTileFunctions.java', 555, 'BOOLEAN', "bing_tile('213') = bing_tile(3, 5, 3)", True),
    ('TestBingTileFunctions.java', 556, 'BOOLEAN', "bing_tile('213') = bing_tile('213')", True),
    ('TestBingTileFunctions.java', 558, 'BOOLEAN', 'bing_tile(3, 5, 3) = bing_tile(3, 5, 4)', False),
    ('TestBingTileFunctions.java', 559, 'BOOLEAN', "bing_tile('213') = bing_tile('2131')", False),
    ('TestBingTileFunctions.java', 565, 'BOOLEAN', 'bing_tile(3, 5, 3) <> bing_tile(3, 5, 3)', False),
    ('TestBingTileFunctions.java', 566, 'BOOLEAN', "bing_tile('213') <> bing_tile(3, 5, 3)", False),
    ('TestBingTileFunctions.java', 567, 'BOOLEAN', "bing_tile('213') <> bing_tile('213')", False),
    ('TestBingTileFunctions.java', 569, 'BOOLEAN', 'bing_tile(3, 5, 3) <> bing_tile(3, 5, 4)', True),
    ('TestBingTileFunctions.java', 570, 'BOOLEAN', "bing_tile('213') <> bing_tile('2131')", True),
    ('TestBingTileFunctions.java', 576, 'BOOLEAN', 'null IS DISTINCT FROM null', False),
    ('TestBingTileFunctions.java', 577, 'BOOLEAN', 'bing_tile(3, 5, 3) IS DISTINCT FROM null', True),
    ('TestBingTileFunctions.java', 578, 'BOOLEAN', 'null IS DISTINCT FROM bing_tile(3, 5, 3)', True),
    ('TestBingTileFunctions.java', 580, 'BOOLEAN', 'bing_tile(3, 5, 3) IS DISTINCT FROM bing_tile(3, 5, 3)', False),
    ('TestBingTileFunctions.java', 581, 'BOOLEAN', "bing_tile('213') IS DISTINCT FROM bing_tile(3, 5, 3)", False),
    ('TestBingTileFunctions.java', 582, 'BOOLEAN', "bing_tile('213') IS DISTINCT FROM bing_tile('213')", False),
    ('TestBingTileFunctions.java', 584, 'BOOLEAN', 'bing_tile(3, 5, 3) IS DISTINCT FROM bing_tile(3, 5, 4)', True),
    ('TestBingTileFunctions.java', 585, 'BOOLEAN', "bing_tile('213') IS DISTINCT FROM bing_tile('2131')", True),
    ('TestSphericalGeoFunctions.java', 142, 'DOUBLE', 'great_circle_distance(36.12, -86.67, 33.94, -118.40)', 2886.448973436703),
    ('TestSphericalGeoFunctions.java', 143, 'DOUBLE', 'great_circle_distance(33.94, -118.40, 36.12, -86.67)', 2886.448973436703),
    ('TestSphericalGeoFunctions.java', 144, 'DOUBLE', 'great_circle_distance(42.3601, -71.0589, 42.4430, -71.2290)', 16.73469743457461),
    ('TestSphericalGeoFunctions.java', 145, 'DOUBLE', 'great_circle_distance(36.12, -86.67, 36.12, -86.67)', 0.0),
]

CHUNK = 30
CHUNKS = [CASES[i : i + CHUNK] for i in range(0, len(CASES), CHUNK)]


def _eq(got, want, typ):
    if want is None or got is None:
        return got is None and want is None
    if typ == "DOUBLE":
        try:
            return math.isclose(float(got), float(want), rel_tol=1e-9,
                                abs_tol=1e-12)
        except (TypeError, ValueError):
            return False
    if typ == "BOOLEAN":
        return got is want
    return got == want


def test_excluded_inventory_not_stale():
    """The docstring's unresolved-exclusion list is the audit
    instrument — it must not name a function that actually has pins
    in CASES (the r11 expand_envelope drift class)."""
    doc = __doc__
    start = doc.index("- unresolved:")
    end = doc.index("this round")
    names = re.findall(r"[A-Za-z_]{4,}", doc[start:end])
    excluded = {
        n for n in names
        if n not in ("unresolved", "the", "boolean", "ops", "tail",
                     "out", "of", "scope")
    }
    pinned = " ".join(expr for (_, _, _, expr, _) in CASES)
    stale = sorted(n for n in excluded if re.search(rf"\b{n}\s*\(", pinned))
    assert not stale, f"excluded-listed but pinned in CASES: {stale}"


@pytest.mark.parametrize(
    "chunk", CHUNKS, ids=[f"chunk{i:02d}" for i in range(len(CHUNKS))]
)
def test_geometry_pins(spark, chunk):
    select = ", ".join(
        f"({expr}) AS c{i}" for i, (_, _, _, expr, _) in enumerate(chunk)
    )
    row = run_sql(spark, f"SELECT {select}").collect()[0]
    failures = [
        f"{f}:{ln} {expr!r}: got {row[i]!r}, want {want!r}"
        for i, (f, ln, typ, expr, want) in enumerate(chunk)
        if not _eq(row[i], want, typ)
    ]
    assert not failures, "\n".join(failures)
