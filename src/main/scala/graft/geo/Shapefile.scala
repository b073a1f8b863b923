package graft.geo

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal ESRI shapefile on-ramp (SURVEY.md §2.1 S6; reference
  * `whalefinder/cleaner.py:18-27` loads the GOaS ocean shapefile through
  * geopandas). Implements the public ESRI white-paper format directly:
  * `.shp` Polygon records (shape type 5) plus the sidecar `.dbf`
  * (dBase III) attribute table for feature names — no GIS dependency.
  *
  * Output is the engine's `(name, xs, ys)` polygon contract with rings
  * folded NaN-separated exactly like [[Wkt.toVertexArrays]], so the
  * result drops into the same broadcast-BNLJ / grid joins unchanged
  * (shapefile ring order — outer clockwise, holes counter-clockwise —
  * is irrelevant to the even-odd ray cast).
  *
  * Parsing happens on the driver: polygon tables are dimension-sized by
  * definition (the GOaS file is 9 features), and the result immediately
  * broadcasts. Multi-part/multi-ring features stay ONE row each.
  */
object Shapefile {

  final case class Feature(name: String, xs: Array[Double], ys: Array[Double])

  /** Read `base.shp` + `base.dbf` (pass the path with or without the
    * `.shp` suffix). `nameField`: dBase column holding the feature name;
    * default = first character (type C) field.
    */
  def read(path: String, nameField: Option[String] = None): Seq[Feature] = {
    val base = path.stripSuffix(".shp")
    val rings = readShpRings(s"$base.shp")
    val names = readDbfNames(s"$base.dbf", nameField)
    require(names.size == rings.size,
      s"shp has ${rings.size} records but dbf has ${names.size}")
    names.zip(rings).map { case (name, rs) =>
      // ONE ring-fold for both on-ramps (Wkt.foldRings): trailing
      // separator on multi-ring arrays kills the index-wrap phantom
      // chord, null-shape records (zero rings) fold to empty arrays
      val (xs, ys) = Wkt.foldRings(rs)
      Feature(name, xs, ys)
    }
  }

  /** The features as the `(name, xs, ys)` DataFrame contract. */
  def loadPolygons(spark: SparkSession, path: String,
      nameField: Option[String] = None): DataFrame = {
    import spark.implicits._
    read(path, nameField).map(f => (f.name, f.xs, f.ys)).toDF("name", "xs", "ys")
  }

  /** Rings per record from the `.shp` geometry file. Null-shape records
    * (type 0) yield no rings; only Polygon (5) is supported otherwise.
    */
  private def readShpRings(shp: String): Seq[Seq[Array[(Double, Double)]]] = {
    val buf = ByteBuffer.wrap(Files.readAllBytes(Paths.get(shp)))
    buf.order(ByteOrder.BIG_ENDIAN)
    require(buf.getInt(0) == 9994, s"not a shapefile: $shp")
    val fileLenBytes = buf.getInt(24) * 2 // length counted in 16-bit words
    var pos = 100 // fixed main-header size
    val out = Seq.newBuilder[Seq[Array[(Double, Double)]]]
    while (pos < fileLenBytes) {
      val contentLenBytes = buf.order(ByteOrder.BIG_ENDIAN).getInt(pos + 4) * 2
      val c = pos + 8 // content start
      buf.order(ByteOrder.LITTLE_ENDIAN)
      buf.getInt(c) match {
        case 0 => out += Seq.empty // null shape
        case 5 =>
          val numParts = buf.getInt(c + 36)
          val numPoints = buf.getInt(c + 40)
          val partsOff = c + 44
          val pointsOff = partsOff + 4 * numParts
          val starts = (0 until numParts).map(i => buf.getInt(partsOff + 4 * i))
          val bounds = starts :+ numPoints
          out += (0 until numParts).map { p =>
            (bounds(p) until bounds(p + 1)).map { i =>
              (buf.getDouble(pointsOff + 16 * i),
                buf.getDouble(pointsOff + 16 * i + 8))
            }.toArray
          }
        case t => throw new IllegalArgumentException(
          s"unsupported shape type $t (only Polygon/5) in $shp")
      }
      pos += 8 + contentLenBytes
    }
    out.result()
  }

  /** One name per record from the dBase III attribute table. */
  private def readDbfNames(dbf: String, nameField: Option[String]): Seq[String] = {
    val b = Files.readAllBytes(Paths.get(dbf))
    val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val numRecords = buf.getInt(4)
    val headerSize = buf.getShort(8) & 0xFFFF
    val recordSize = buf.getShort(10) & 0xFFFF
    // field descriptors: 32 bytes each from offset 32 until the 0x0D mark
    var off = 32
    var fields = Vector.empty[(String, Char, Int)] // (name, type, length)
    while (b(off) != 0x0D) {
      val raw = new String(b, off, 11, StandardCharsets.US_ASCII)
      val fname = raw.takeWhile(ch => ch != 0 && ch != ' ')
      fields :+= ((fname, b(off + 11).toChar, b(off + 16) & 0xFF))
      off += 32
    }
    val target = nameField match {
      case Some(n) => fields.indexWhere(_._1.equalsIgnoreCase(n)) match {
        case -1 => throw new IllegalArgumentException(
          s"no field '$n' in $dbf (have ${fields.map(_._1).mkString(", ")})")
        case i => i
      }
      case None => fields.indexWhere(_._2 == 'C') match {
        case -1 => 0
        case i => i
      }
    }
    (0 until numRecords).map { r =>
      val rec = headerSize + r * recordSize
      val fieldOff = 1 + fields.take(target).map(_._3).sum // +1 deletion flag
      new String(b, rec + fieldOff, fields(target)._3, StandardCharsets.US_ASCII)
        .trim
    }
  }
}
