package graft.etl

/** Job-failing invariants (SURVEY §5.1; /root/reference/synth/errors.py). */

/** Duplicate specific-discipline name with conflicting parent disciplines
  * across rounds (errors.py:3-19, raised etl.py:309-312).
  */
case class SpecificDisciplineParentMismatch(names: Seq[String]) extends Exception(
  s"specific disciplines with conflicting parent disciplines across rounds: ${names.mkString(", ")}")

/** users.csv GUIDs must be unique (errors.py:22-29, raised resources.py:420-421). */
case class DuplicateUserGuidError(guids: Seq[Long]) extends Exception(
  s"duplicate user GUIDs in users.csv: ${guids.mkString(", ")}")
