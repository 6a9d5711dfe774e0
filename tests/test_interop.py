"""XFOIL text-format interop tests (ports the reference's
TestExtractAerodynamicCoefficients spec, test_main.py:204-254, and adds
CPWR/DUMP parser coverage)."""

from airfoil_tpu.interop import (
    extract_aerodynamic_coefficients,
    parse_bl_dump,
    parse_cp_file,
    write_xfoil_script,
)

XFOIL_STDOUT = """
 Solving BL system ...
  a =  5.000   CL =  0.6352   CD = 0.009241   CDp = 0.007812   Cm = -0.0521
 VISCAL:  Convergence achieved in 12 iterations
"""


class TestExtractCoefficients:
    def test_extracts_all(self):
        c = extract_aerodynamic_coefficients(XFOIL_STDOUT)
        assert abs(c["CL"] - 0.6352) < 1e-4
        assert abs(c["CD"] - 0.009241) < 1e-6
        assert abs(c["CDp"] - 0.007812) < 1e-6
        assert abs(c["Cm"] - (-0.0521)) < 1e-4

    def test_takes_last_occurrence(self):
        stdout = """
  a =  5.000   CL =  0.5000   CD = 0.010000   CDp = 0.008000   Cm = -0.050
  a =  5.000   CL =  0.6352   CD = 0.009241   CDp = 0.007812   Cm = -0.0521
        """
        c = extract_aerodynamic_coefficients(stdout)
        assert abs(c["CL"] - 0.6352) < 1e-4

    def test_empty_on_no_match(self):
        assert extract_aerodynamic_coefficients("XFOIL Version 6.99\n") == {}

    def test_negative_cl(self):
        c = extract_aerodynamic_coefficients(
            "  CL = -0.3214   CD = 0.011200   CDp = 0.009100   Cm =  0.0312")
        assert c["CL"] < 0

    def test_zero_alpha(self):
        c = extract_aerodynamic_coefficients(
            "  CL =  0.0000   CD = 0.006500   CDp = 0.005200   Cm =  0.0000")
        assert abs(c["CL"]) < 1e-4


class TestCpFile:
    def test_parse(self, tmp_path):
        p = tmp_path / "cp.txt"
        p.write_text("#  x        Cp\n 1.00000   0.20000\n 0.50000  -0.80000\n"
                     "garbage line\n 0.00000   1.00000\n")
        x, cp = parse_cp_file(str(p))
        assert x == [1.0, 0.5, 0.0]
        assert cp == [0.2, -0.8, 1.0]


class TestBLDump:
    DUMP = (
        "   0.000   1.000   0.001   0.950   0.0040   0.0020   0.00300  1.50\n"
        "   0.100   0.900   0.010   1.050   0.0030   0.0015   0.00100  2.10\n"
        "   0.200   0.800   0.020   1.100   0.0020   0.0010   0.00030  2.59\n"
        "   0.300   0.700   0.030   1.120   0.0018   0.0009   0.00090  1.60\n"
        "   0.400   0.600   0.035   1.130   0.0019   0.0010   0.00095  1.55\n"
        "\n"
        "   0.000   0.000   0.000   0.500   0.0001   0.0001   0.01000  2.20\n"
        "   0.500   0.500  -0.020   1.000   0.0010   0.0006   0.00200  2.40\n"
        "   0.900   0.950  -0.005   0.950   0.0030   0.0015   0.00150  1.70\n"
    )

    def test_sections_and_columns(self, tmp_path):
        p = tmp_path / "bl.txt"
        p.write_text(self.DUMP)
        bl = parse_bl_dump(str(p))
        assert len(bl["upper"]) == 5
        assert len(bl["lower"]) == 3
        row = bl["upper"][0]
        assert row["x"] == 1.0 and row["dstar"] == 0.004
        assert row["H"] == 1.5

    def test_transition_detected_from_cf_jump(self, tmp_path):
        p = tmp_path / "bl.txt"
        p.write_text(self.DUMP)
        bl = parse_bl_dump(str(p))
        # upper: cf jumps 0.0003 -> 0.0009 (x3) at x=0.7
        assert bl["transition_upper_x"] == 0.7

    def test_missing_file(self):
        assert parse_bl_dump("/no/such/file") is None


class TestScriptWriter:
    def test_viscous_script(self):
        s = write_xfoil_script("airfoil.dat", "cp.txt", "bl.txt",
                               1e6, 5.0, viscous=True, smooth_geometry=True)
        lines = s.splitlines()
        assert lines[0] == "LOAD airfoil.dat"
        assert "PANE" in lines
        assert "GDES" in lines and "SMOO" in lines
        assert "VISC 1000000" in lines
        assert "ITER 500" in lines
        assert "ALFA 5.0" in lines
        assert "DUMP bl.txt" in lines
        assert lines[-1] == "QUIT"

    def test_inviscid_script(self):
        s = write_xfoil_script("a.dat", "cp.txt", "bl.txt", 1e6, 2.0,
                               viscous=False)
        assert "VISC" not in s and "DUMP" not in s
