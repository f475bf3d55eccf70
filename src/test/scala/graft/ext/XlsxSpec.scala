package graft.ext

import graft.SparkFunSuite
import Xlsx.{Num, Text}

class XlsxSpec extends SparkFunSuite {

  test("round-trip: shared + inline strings, rich runs, numbers, " +
    "two sheets, cell refs") {
    val b = Xlsx.buildXlsx(Seq(
      ("data", Seq(
        Seq(Text("alpha header"), Text("beta header"), Num("42")),
        Seq(Text("entities & <angles>"), Num("3.25"), Text("gamma row")))),
      ("notes", Seq(
        Seq(Text("alpha header"), Num("7")))))) // repeated shared string
    val Right(cells) = Xlsx.parseXlsx(b): @unchecked
    val byRef = cells.map(c => (c.sheet, c.ref) -> c).toMap
    assert(byRef(("data", "A1")).value == "alpha header")
    assert(byRef(("data", "C1")).value == "42" &&
      byRef(("data", "C1")).kind == "num")
    assert(byRef(("data", "A2")).value == "entities & <angles>")
    assert(byRef(("data", "B2")).value == "3.25")
    assert(byRef(("notes", "A1")).value == "alpha header")
    // both string paths present (builder alternates shared/inline)
    assert(cells.exists(_.kind == "shared") &&
      cells.exists(_.kind == "inline"))
    // refs → coordinates
    assert(byRef(("data", "C1")).row == 1 && byRef(("data", "C1")).colNum == 3)
    assert(byRef(("data", "B2")).row == 2 && byRef(("data", "B2")).colNum == 2)
    assert(byRef(("notes", "A1")).sheetIdx == 1)
  }

  test("attribute lookup never resolves from inside a longer " +
    "attribute name") {
    // a sheet tag whose FIRST `name="` substring sits inside
    // `longname="…"` — the walk must take the real `name` attribute
    val wb = """<workbook><sheets><sheet longname="WRONG" name="right" sheetId="1"/></sheets></workbook>"""
    val b = ZipArchive.buildZip(Seq(
      ("xl/workbook.xml", 8, wb.getBytes),
      ("xl/worksheets/sheet1.xml", 8,
        """<worksheet><sheetData><row r="1"><c r="A1"><v>7</v></c></row></sheetData></worksheet>"""
          .getBytes)))
    val Right(cells) = Xlsx.parseXlsx(b): @unchecked
    assert(cells.head.sheet == "right", cells.head.toString)
  }

  test("cell ref arithmetic incl. multi-letter columns") {
    assert(Xlsx.parseRef("A1") == (1, 1))
    assert(Xlsx.parseRef("Z9") == (9, 26))
    assert(Xlsx.parseRef("AA10") == (10, 27))
    assert(Xlsx.parseRef("AZ3") == (3, 52))
    assert(Xlsx.parseRef("BA3") == (3, 53))
  }

  test("poison: typed rejects, never a crash") {
    assert(Xlsx.parseXlsx("not a zip".getBytes).isLeft)
    assert(Xlsx.parseXlsx(Array.emptyByteArray) == Left("too short"))
    val noWb = ZipArchive.buildZip(Seq(("other.xml", 8, "<a/>".getBytes)))
    assert(Xlsx.parseXlsx(noWb) == Left("no xl/workbook.xml"))
    def withSheet(cellsXml: String, sst: Option[String] = None)
        : Array[Byte] = {
      val wb = """<workbook><sheets><sheet name="s" sheetId="1"/></sheets></workbook>"""
      ZipArchive.buildZip(Seq(
        ("xl/workbook.xml", 8, wb.getBytes),
        ("xl/worksheets/sheet1.xml", 8,
          s"<worksheet><sheetData>$cellsXml</sheetData></worksheet>"
            .getBytes)) ++
        sst.map(s => ("xl/sharedStrings.xml", 8,
          s"<sst>$s</sst>".getBytes)))
    }
    // shared-string index out of range: typed reject, not a crash
    assert(Xlsx.parseXlsx(withSheet("""<c r="A1" t="s"><v>5</v></c>""",
      Some("<si><t>x</t></si>"))) ==
      Left("shared string index out of range"))
    assert(Xlsx.parseXlsx(withSheet("""<c r="A1" t="s"><v>zap</v></c>""",
      Some("<si><t>x</t></si>"))) ==
      Left("bad shared string index"))
    // bad refs
    assert(Xlsx.parseXlsx(withSheet("""<c r="11"><v>1</v></c>"""))
      == Left("bad cell ref"))
    assert(Xlsx.parseXlsx(withSheet("""<c r="AAAA1"><v>1</v></c>"""))
      == Left("column out of range"))
    // unterminated structures
    assert(Xlsx.parseXlsx(withSheet("""<c r="A1"><v>1</c>"""))
      == Left("unterminated v"))
    assert(Xlsx.parseXlsx(withSheet("""<c r="A1"><v>1</v>"""))
      == Left("unterminated c"))
    // cell without a ref
    assert(Xlsx.parseXlsx(withSheet("""<c t="s"><v>0</v></c>""",
      Some("<si><t>x</t></si>"))) == Left("cell without ref"))
  }

  test("DataFrame layer: cells out, poison to the error channel") {
    val s = spark; import s.implicits._
    val good = Xlsx.buildXlsx(Seq(("s", Seq(Seq(Text("hi"), Num("1"))))))
    val df = Seq((1L, good), (2L, "junk".getBytes))
      .toDF("doc_id", "blob")
    val cells = Xlsx.extractXlsxCells(df, "blob")
      .orderBy("doc_id", "ref").collect()
    assert(cells.length == 2 && cells.forall(_.getLong(0) == 1L))
    val errs = Xlsx.xlsxErrors(df, "blob").collect()
    assert(errs.length == 1 && errs(0).getLong(0) == 2L)
  }
}
