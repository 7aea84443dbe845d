package graft.sources

import scala.util.Try
import scala.xml.{Elem, Node, XML}

/** Row type for the CWE weakness catalog (cwe_handler.py:60-102). */
case class CweRelated(id: String, nature: String)
case class CweWeakness(
    ID: String,
    Name: String,
    Abstraction: String,
    Status: String,
    Description: String,
    Related_Weaknesses: Seq[CweRelated])

/** Plain-Scala CWE XML parsing, executed inside a Dataset.flatMap (D1).
  * scala.xml is namespace-tolerant via label matching, which subsumes the
  * reference's manual namespace strip (cwe_handler.py:39-41, F7).
  */
object CweXmlParser {

  /** F6: XHTML→HTML tag rewrite incl. self-closing forms
    * (cwe_handler.py:54-57). */
  def xhtmlToHtml(s: String): String =
    "</?xhtml:([A-Za-z]+)\\s*(/?)>".r.replaceAllIn(s, m => {
      val close = if (m.matched.startsWith("</")) "/" else ""
      val selfClose = m.group(2)
      s"<$close${m.group(1).toLowerCase}$selfClose>"
    })

  /** F8: recursive element-text flatten (text + children + tails),
    * whitespace-normalized (cwe_handler.py:43-52). */
  def flattenText(n: Node): String =
    n.text.split("\\s+").filter(_.nonEmpty).mkString(" ")

  /** One XML document → weakness rows; malformed XML → empty. */
  def parse(xmlText: String): Seq[CweWeakness] =
    Try(XML.loadString(xhtmlToHtml(xmlText))).toOption match {
      case None => Seq.empty
      case Some(root) => weaknesses(root)
    }

  private def weaknesses(root: Elem): Seq[CweWeakness] =
    (root \\ "Weakness").map { w =>
      CweWeakness(
        ID = attr(w, "ID"),
        Name = attr(w, "Name"),
        Abstraction = attr(w, "Abstraction"),
        Status = attr(w, "Status"),
        Description = (w \ "Description").headOption.map(flattenText).getOrElse(""),
        Related_Weaknesses = (w \ "Related_Weaknesses" \ "Related_Weakness").map { r =>
          CweRelated(id = attr(r, "CWE_ID"), nature = attr(r, "Nature"))
        })
    }

  private def attr(n: Node, name: String): String =
    n.attribute(name).map(_.text).orNull
}
